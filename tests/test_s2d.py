"""Space-to-depth encoder stages (models/s2d.py).

The s2d pair must be numerically the SAME operator as the two ConvBlocks
it replaces — same parameter tree, same outputs, same gradients — so a
checkpoint trained either way loads and evaluates identically.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from liftreg_tpu.models import s2d
from liftreg_tpu.models.subspace_backproj import SubspaceEncoder


def _ref_pair(x, w0, b0, w1, b1, slope=0.2):
    """Stage 0 (k3 s1 pad1) + LeakyReLU + stage 1 (k3 s2 pad1) + LeakyReLU
    via XLA convs — the ConvBlock formulation (models/blocks.py:60-70)."""
    def dn(a, w):
        return jax.lax.conv_dimension_numbers(
            a.shape, w.shape, ("NDHWC", "DHWIO", "NDHWC"))
    y = jax.lax.conv_general_dilated(x, w0, (1, 1, 1), [(1, 1)] * 3,
                                     dimension_numbers=dn(x, w0))
    y = jax.nn.leaky_relu(y + b0, slope)
    z = jax.lax.conv_general_dilated(y, w1, (2, 2, 2), [(1, 1)] * 3,
                                     dimension_numbers=dn(y, w1))
    return jax.nn.leaky_relu(z + b1, slope)


def _rand_pair(rng, D, C, F, G, B=2):
    x = jnp.asarray(rng.randn(B, D, D, D, C), jnp.float32)
    w0 = jnp.asarray(rng.randn(3, 3, 3, C, F) * 0.1, jnp.float32)
    b0 = jnp.asarray(rng.randn(F) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.randn(3, 3, 3, F, G) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.randn(G) * 0.1, jnp.float32)
    return x, w0, b0, w1, b1


@pytest.mark.parametrize("D,C,F,G", [(8, 5, 16, 32), (12, 3, 8, 8),
                                     (16, 5, 16, 32)])
def test_pair_matches_xla_convs(D, C, F, G):
    rng = np.random.RandomState(0)
    x, w0, b0, w1, b1 = _rand_pair(rng, D, C, F, G)
    ref = _ref_pair(x, w0, b0, w1, b1)
    got = s2d.conv_pair_s2d(x, w0, b0, w1, b1)
    assert got.shape == ref.shape == (2, D // 2, D // 2, D // 2, G)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_pair_gradients_match():
    rng = np.random.RandomState(1)
    x, w0, b0, w1, b1 = _rand_pair(rng, 8, 5, 16, 32)
    tgt = jnp.asarray(rng.randn(2, 4, 4, 4, 32), jnp.float32)

    def loss(fn, p):
        return jnp.mean((fn(x, *p) - tgt) ** 2)

    ga = jax.grad(lambda p: loss(_ref_pair, p))((w0, b0, w1, b1))
    gb = jax.grad(lambda p: loss(s2d.conv_pair_s2d, p))((w0, b0, w1, b1))
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_encoder_tree_and_output_compat():
    """s2d encoder: identical param tree AND identical outputs from the
    same params — a checkpoint is interchangeable between the paths."""
    x = jnp.asarray(np.random.RandomState(2).randn(1, 16, 16, 16, 5),
                    jnp.float32)
    base = SubspaceEncoder(latent_dim=8, enc_filters=(16, 32, 32),
                           fc_widths=(64,))
    fast = SubspaceEncoder(latent_dim=8, enc_filters=(16, 32, 32),
                           fc_widths=(64,), s2d_stage01=True)
    pb = base.init(jax.random.PRNGKey(0), x)
    pf = fast.init(jax.random.PRNGKey(0), x)

    flat_b = jax.tree_util.tree_leaves_with_path(pb)
    flat_f = jax.tree_util.tree_leaves_with_path(pf)
    assert [(jax.tree_util.keystr(k), v.shape) for k, v in flat_b] == \
           [(jax.tree_util.keystr(k), v.shape) for k, v in flat_f]

    # identical initialization streams -> identical params
    for (_, a), (_, b) in zip(flat_b, flat_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    out_b = base.apply(pb, x)
    out_f = fast.apply(pb, x)   # base params through the s2d path
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_b),
                               atol=2e-4, rtol=1e-4)


def test_regnet_s2d_tree_and_output_compat():
    """RegNet2D3D: the s2d switch keeps the parameter tree (explicit
    CheckpointConvBlock_<n> names across encoder AND decoder) and the
    output, including the full-res stage-0 skip recovered by unpacking."""
    from liftreg_tpu.models.unet2d3d import RegNet2D3D
    from liftreg_tpu.ops import drr

    sz, P = (16, 16, 16), 2
    rng = np.random.RandomState(3)
    poses = drr.synthesize_poses(30.0, P, sz[1])
    res = drr.default_resolution(sz)
    batch = {
        "source": jnp.asarray(rng.rand(1, 1, *sz), jnp.float32),
        "target": jnp.asarray(rng.rand(1, 1, *sz), jnp.float32),
        "original_source": jnp.asarray(rng.rand(1, 1, *sz), jnp.float32),
        "source_label": jnp.ones((1, 1) + sz, jnp.float32),
        "target_proj": jnp.asarray(rng.rand(1, P, *res), jnp.float32),
        "target_poses": jnp.tile(poses[None], (1, 1, 1)),
        "spacing": jnp.asarray([[2.2, 2.2, 2.2]], jnp.float32),
    }
    base = RegNet2D3D(img_sz=sz, drr_feature_num=P, inverse_iters=2)
    fast = RegNet2D3D(img_sz=sz, drr_feature_num=P, inverse_iters=2,
                      s2d_encoder=True)
    pb = base.init(jax.random.PRNGKey(0), batch)
    pf = fast.init(jax.random.PRNGKey(0), batch)
    flat_b = jax.tree_util.tree_leaves_with_path(pb)
    flat_f = jax.tree_util.tree_leaves_with_path(pf)
    assert [(jax.tree_util.keystr(k), v.shape) for k, v in flat_b] == \
           [(jax.tree_util.keystr(k), v.shape) for k, v in flat_f]

    out_b = base.apply(pb, batch)
    out_f = fast.apply(pb, batch)   # base params through the s2d path
    np.testing.assert_allclose(np.asarray(out_f["phi"]),
                               np.asarray(out_b["phi"]),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_s2d_training_step_on_mesh():
    """s2d encoder under the 8-device batch-sharded mesh: grads flow,
    loss finite, second step reuses the compiled program."""
    import optax
    from liftreg_tpu.losses import SubspaceLoss
    from liftreg_tpu.models import LiftRegSubspaceBackproj
    from liftreg_tpu.ops import drr
    from liftreg_tpu.parallel import make_mesh, replicated, shard_batch

    sz, latent, P, B = 16, 2, 2, 8
    rng = np.random.default_rng(0)
    model = LiftRegSubspaceBackproj(img_sz=(sz,) * 3, latent_dim=latent,
                                    drr_feature_num=P, s2d_encoder=True)
    inputs = {
        "source": jnp.asarray(rng.uniform(-1, 1, (B, 1, sz, sz, sz))
                              .astype(np.float32)),
        "target": jnp.asarray(rng.uniform(-1, 1, (B, 1, sz, sz, sz))
                              .astype(np.float32)),
        "source_label": jnp.ones((B, 1, sz, sz, sz), jnp.float32),
        "target_label": jnp.ones((B, 1, sz, sz, sz), jnp.float32),
        "target_proj": jnp.asarray(rng.uniform(-1, 1, (B, P, 24, 24))
                                   .astype(np.float32)),
        "target_poses": jnp.asarray(
            np.tile(drr.synthesize_poses(30.0, P, sz), (B, 1, 1))),
    }
    pca = {"vectors": jnp.asarray(rng.normal(size=(latent, 3 * sz ** 3))
                                  .astype(np.float32) * 0.01),
           "mean": jnp.zeros((3 * sz ** 3,), jnp.float32)}
    params = model.init(jax.random.PRNGKey(0), inputs, pca)
    loss_obj = SubspaceLoss({"sim_class": "ncc", "initial_reg_factor": 0.01,
                             "min_reg_factor": 0.01})
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    mesh = make_mesh()
    batch = shard_batch(inputs, mesh)
    params = jax.device_put(params, replicated(mesh))
    opt = jax.device_put(opt, replicated(mesh))
    pca_r = {k: jax.device_put(v, replicated(mesh)) for k, v in pca.items()}

    @jax.jit
    def step(p, o, b, pc):
        def lf(pp):
            out = model.apply(pp, b, pc)
            return loss_obj(out, 0.01)["total_loss"]
        l, g = jax.value_and_grad(lf)(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, l

    params, opt, l1 = step(params, opt, batch, pca_r)
    params, opt, l2 = step(params, opt, batch, pca_r)
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))


def test_encoder_odd_size_falls_back():
    """Odd spatial dims are ineligible; the flag silently uses ConvBlock
    (same tree, so nothing changes for the user)."""
    x = jnp.zeros((1, 14, 14, 14, 5), jnp.float32)  # 14 even -> eligible
    xo = jnp.zeros((1, 15, 15, 15, 5), jnp.float32)
    assert s2d.eligible(x.shape, (16, 32))
    assert not s2d.eligible(xo.shape, (16, 32))
    enc = SubspaceEncoder(latent_dim=4, enc_filters=(8, 8), fc_widths=(16,),
                          s2d_stage01=True)
    p = enc.init(jax.random.PRNGKey(0), xo)
    assert enc.apply(p, xo).shape == (1, 4)
