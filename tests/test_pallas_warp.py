"""Interpret-mode goldens for the Pallas locality warp (ops/pallas_warp.py).

The kernel must match resample's golden-tested paths (which are
themselves bit-level torch grid_sample goldens, tests/test_resample.py)
whenever the field obeys the (dy_max, dx_max) window — z displacement is
unbounded by construction (sublane gather).
"""
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # interpret-mode kernel goldens (~2 min); the kernel is a no-go opt-in (DESIGN.md sec 3)

import jax.numpy as jnp

from liftreg_tpu import coords
from liftreg_tpu.ops import pallas_warp, resample


def _smooth_field(rng, shape, scale_zyx, B):
    """Pixel-space sample coords = identity + smooth low-rank displacement."""
    import scipy.ndimage as ndi
    D, W, H = shape
    base = coords.identity_map_np(shape)
    disp = np.zeros((B, 3, D, W, H), np.float32)
    for b in range(B):
        g = rng.normal(0, 1, (3, 4, 4, 4)).astype(np.float32)
        up = np.stack([ndi.zoom(g[c], (D / 4, W / 4, H / 4), order=3)
                       for c in range(3)])
        disp[b] = up * np.asarray(scale_zyx, np.float32)[:, None, None, None]
    phi = base[None] + disp
    sz = np.asarray([D - 1, W - 1, H - 1], np.float32)
    return jnp.asarray(np.moveaxis(
        (phi + 1.0) / 2.0 * sz[:, None, None, None], 1, -1))


def test_matches_oct_and_quad_within_window():
    rng = np.random.default_rng(3)
    D = W = H = 24
    vol = jnp.asarray(rng.uniform(-1, 1, (2, 1, D, W, H)).astype(np.float32))
    # large z motion, small y/x — the kernel's design point
    px = _smooth_field(rng, (D, W, H), (0.5, 0.12, 0.12), 2)
    dyw, dxw = pallas_warp.displacement_window(px)
    assert float(dyw) <= 6 and float(dxw) <= 6

    for padding in ("zeros", "border"):
        ref = resample._trilinear_oct_bf16(vol, px, padding)
        out = pallas_warp.warp_plane_gather(vol, px, padding=padding,
                                            dy_max=6, dx_max=6,
                                            interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, err_msg=padding)

    ref = resample._trilinear_quad(vol, px, "zeros")
    out = pallas_warp.warp_plane_gather(vol, px, padding="zeros", dy_max=6,
                                        dx_max=6, taps_dtype=jnp.float32,
                                        interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_far_outside_coords_zero_padding():
    rng = np.random.default_rng(5)
    D = W = H = 16
    vol = jnp.asarray(rng.uniform(-1, 1, (1, 1, D, W, H)).astype(np.float32))
    px = _smooth_field(rng, (D, W, H), (0.2, 0.1, 0.1), 1) + 40.0
    ref = resample._trilinear_quad(vol, px, "zeros")
    out = pallas_warp.warp_plane_gather(vol, px, padding="zeros", dy_max=4,
                                        dx_max=4, taps_dtype=jnp.float32,
                                        interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_unbounded_z_small_window():
    """z displacement far beyond any window stays exact (gathered axis)."""
    rng = np.random.default_rng(7)
    D, W, H = 32, 16, 16
    vol = jnp.asarray(rng.uniform(-1, 1, (1, 1, D, W, H)).astype(np.float32))
    px = _smooth_field(rng, (D, W, H), (2.0, 0.04, 0.04), 1)  # z ~ +/-12 vox
    dyw, dxw = pallas_warp.displacement_window(px)
    assert float(dyw) <= 2 and float(dxw) <= 2
    ref = resample._trilinear_quad(vol, px, "zeros")
    out = pallas_warp.warp_plane_gather(vol, px, padding="zeros", dy_max=2,
                                        dx_max=2, taps_dtype=jnp.float32,
                                        interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_noncubic_and_multichannel():
    rng = np.random.default_rng(11)
    D, W, H = 10, 14, 18
    vol = jnp.asarray(rng.uniform(-1, 1, (1, 2, D, W, H)).astype(np.float32))
    px = _smooth_field(rng, (D, W, H), (0.15, 0.1, 0.1), 1)
    ref = resample._trilinear_quad(vol, px, "zeros")
    out = pallas_warp.warp_plane_gather(vol, px, padding="zeros", dy_max=4,
                                        dx_max=4, taps_dtype=jnp.float32,
                                        interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_identity_exact():
    rng = np.random.default_rng(13)
    D = W = H = 12
    vol = jnp.asarray(rng.uniform(-1, 1, (1, 1, D, W, H)).astype(np.float32))
    px = _smooth_field(rng, (D, W, H), (0.0, 0.0, 0.0), 1)
    out = pallas_warp.warp_plane_gather(vol, px, padding="zeros", dy_max=1,
                                        dx_max=1, taps_dtype=jnp.float32,
                                        interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(vol), atol=1e-5)


def test_window_measure():
    rng = np.random.default_rng(17)
    D = W = H = 16
    px = _smooth_field(rng, (D, W, H), (0.1, 0.6, 0.3), 1)
    dyw, dxw = pallas_warp.displacement_window(px)
    # the measured window must be a sufficient dy/dx_max: exactness holds
    vol = jnp.asarray(rng.uniform(-1, 1, (1, 1, D, W, H)).astype(np.float32))
    ref = resample._trilinear_quad(vol, px, "zeros")
    out = pallas_warp.warp_plane_gather(
        vol, px, padding="zeros", dy_max=int(dyw), dx_max=int(dxw),
        taps_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pipeline_plane_window_matches_default():
    """RegistrationPipeline(warp_plane_window=...) must reproduce the
    default serving output when the field obeys the window (tiny shapes;
    the kernel auto-interprets on CPU)."""
    import jax
    from liftreg_tpu.pipeline import RegistrationPipeline

    rng = np.random.default_rng(21)
    sz = (16, 16, 16)
    kw = dict(img_sz=sz, latent_dim=4, n_proj=2, resolution=(24, 24))
    pipe0 = RegistrationPipeline(**kw)
    pipe1 = RegistrationPipeline(warp_plane_window=(4, 4), **kw)
    n = 3 * 16 ** 3
    pca = {"vectors": jnp.asarray(
               rng.normal(size=(4, n)).astype(np.float32) * 0.003),
           "mean": jnp.asarray(
               rng.normal(size=(n,)).astype(np.float32) * 0.003)}
    params = pipe0.init_params(jax.random.PRNGKey(0), pca)
    src = jnp.asarray(
        rng.uniform(-1000, 0, (1, 1) + sz).astype(np.float32))
    tgt = jnp.asarray(
        rng.uniform(-1000, 0, (1, 1) + sz).astype(np.float32))
    seg = jnp.ones((1, 1) + sz, jnp.float32)
    w0, p0 = pipe0.register(params, pca, src, tgt, seg, seg)
    w1, p1 = pipe1.register(params, pca, src, tgt, seg, seg)
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    np.testing.assert_allclose(np.asarray(w0), np.asarray(w1), atol=1e-5)


def test_plane_sample_grad_matches_plain_ad():
    """warp_plane_sample's analytic coord-gradient (with_grad kernel)
    must match plain AD of the quad implementation, both paddings; the
    image cotangent is fail-loud NaN by design."""
    import jax
    rng = np.random.default_rng(33)
    D = W = H = 16
    vol = jnp.asarray(rng.uniform(-1, 1, (2, 2, D, W, H)).astype(np.float32))
    px = _smooth_field(rng, (D, W, H), (0.4, 0.15, 0.15), 2)

    for padding in ("zeros", "border"):
        a = pallas_warp.warp_plane_sample(padding, 5, 5, "float32", True,
                                          vol, px)
        b = pallas_warp.warp_plane_gather(vol, px, padding=padding,
                                          dy_max=5, dx_max=5,
                                          taps_dtype=jnp.float32,
                                          interpret=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

        gp = jax.grad(lambda p: jnp.sum(pallas_warp.warp_plane_sample(
            padding, 5, 5, "float32", True, vol, p) ** 2))(px)
        gq = jax.grad(lambda p: jnp.sum(
            resample._quad_impl(padding, vol, p)[0] ** 2))(px)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gq),
                                   rtol=1e-4, atol=1e-5, err_msg=padding)

    gv = jax.grad(lambda v: jnp.sum(pallas_warp.warp_plane_sample(
        "zeros", 5, 5, "float32", True, v, px)))(vol)
    assert np.isnan(np.asarray(gv)).all()


def test_warp_image_plane_window_grad():
    """The integrated path: warp_image(plane_window=...) gradient wrt phi
    equals the default path's gradient (the refinement use case)."""
    import jax
    from liftreg_tpu.ops.resample import warp_image
    rng = np.random.default_rng(35)
    D = W = H = 12
    vol = jnp.asarray(rng.uniform(-1, 1, (1, 1, D, W, H)).astype(np.float32))
    px = _smooth_field(rng, (D, W, H), (0.3, 0.1, 0.1), 1)
    # back to normalized phi (B, 3, D, W, H)
    sz = jnp.asarray([D - 1, W - 1, H - 1], jnp.float32)
    phi = jnp.moveaxis(px / sz * 2.0 - 1.0, -1, 1)

    def loss(fn_kwargs):
        return lambda p: jnp.sum(warp_image(vol, p, **fn_kwargs) ** 2)

    g0 = jax.grad(loss({}))(phi)
    g1 = jax.grad(loss({"plane_window": (4, 4)}))(phi)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-4, atol=1e-5)
