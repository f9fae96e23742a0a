"""Legacy block zoo smoke tests (shapes + finiteness)."""
import numpy as np

import jax
import jax.numpy as jnp

from liftreg_tpu.models.legacy_blocks import (ConvNdBlock, DeconvNdBlock,
                                              ProjLayer, ResBlock2D,
                                              ResizeConv3D, TransLayer)


def _init_apply(mod, x, **kwargs):
    params = mod.init(jax.random.PRNGKey(0), x, **kwargs)
    return mod.apply(params, x, **kwargs)


def test_conv_blocks():
    x2 = jnp.ones((2, 8, 8, 3))
    assert _init_apply(ConvNdBlock(6, ndim=2), x2).shape == (2, 8, 8, 6)
    x3 = jnp.ones((1, 6, 6, 6, 2))
    out = _init_apply(ConvNdBlock(4, ndim=3, stride=2), x3)
    assert out.shape == (1, 3, 3, 3, 4)
    assert float(out.min()) >= 0  # ReLU


def test_deconv_and_resize():
    x3 = jnp.ones((1, 4, 4, 4, 2))
    out = _init_apply(DeconvNdBlock(3, ndim=3, kernel_size=1, padding=0), x3)
    assert out.shape == (1, 4, 4, 4, 3)
    out2 = _init_apply(ResizeConv3D(out_dim=(8, 8, 8), features=5), x3)
    assert out2.shape == (1, 8, 8, 8, 5)


def test_resblock_translayer():
    x = jnp.ones((2, 8, 8, 4))
    out = _init_apply(ResBlock2D(6), x)
    assert out.shape == (2, 4, 4, 6)
    xt = jnp.ones((1, 8, 8, 16))  # 8*8*16 = 1024 = 16 * 4^3
    out2 = _init_apply(TransLayer(in_features_3d=16), xt)
    assert out2.shape == (1, 4, 4, 4, 16)


def test_proj_layer_matches_functional():
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.uniform(0, 0.4, (1, 12, 14, 16)).astype(np.float32))
    layer = ProjLayer(volume_spacing=(2.2, 2.2, 2.2), scan_range=30.0,
                      proj_num=2, in_shape=(12, 14, 16))
    params = layer.init(jax.random.PRNGKey(0), vol)
    out = layer.apply(params, vol)
    from liftreg_tpu.ops import drr
    poses = drr.synthesize_poses(30.0, 2, 14)
    want = drr.project(vol, poses, (18, 24), (2.2, 2.2, 2.2))
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-6)
