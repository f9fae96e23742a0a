"""Golden tests: warp/grid_sample vs torch.nn.functional.grid_sample
(the reference's primitive, ``net_utils.py:26-38``)."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from liftreg_tpu import coords
from liftreg_tpu.ops import resample


def torch_bilinear_warp(image, phi, mode, padding_mode, scale):
    """Reference-semantics warp: channel flip + grid_sample, as in
    ``net_utils.Bilinear`` (9-56)."""
    img_t = torch.from_numpy(image)
    phi_t = torch.from_numpy(phi)
    ordered = torch.zeros_like(phi_t)
    ordered[:, 0] = phi_t[:, 2]
    ordered[:, 1] = phi_t[:, 1]
    ordered[:, 2] = phi_t[:, 0]
    if scale:
        img_t = (img_t + 1.0) / 2.0
    out = F.grid_sample(img_t, ordered.permute(0, 2, 3, 4, 1),
                        padding_mode=padding_mode, mode=mode,
                        align_corners=True)
    if scale:
        out = out * 2.0 - 1.0
    return out.numpy()


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
@pytest.mark.parametrize("zero_boundary", [True, False])
@pytest.mark.parametrize("scale", [True, False])
def test_warp_matches_torch(mode, zero_boundary, scale):
    rng = np.random.default_rng(0)
    B, C, D, W, H = 2, 1, 9, 10, 11
    image = rng.uniform(-1, 1, size=(B, C, D, W, H)).astype(np.float32)
    idm = coords.identity_map_np((D, W, H))[None]
    disp = rng.uniform(-0.35, 0.35, size=(B, 3, D, W, H)).astype(np.float32)
    phi = (idm + disp).astype(np.float32)

    want = torch_bilinear_warp(image, phi, mode,
                               "zeros" if zero_boundary else "border", scale)
    got = np.asarray(resample.warp_image(
        jnp.asarray(image), jnp.asarray(phi), mode=mode,
        zero_boundary=zero_boundary, scale_intensity=scale))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_warp_identity_is_noop():
    rng = np.random.default_rng(1)
    image = rng.uniform(-1, 1, size=(1, 1, 8, 8, 8)).astype(np.float32)
    phi = coords.identity_map_np((8, 8, 8))[None]
    out = np.asarray(resample.warp_image(jnp.asarray(image), jnp.asarray(phi)))
    np.testing.assert_allclose(out, image, rtol=1e-5, atol=1e-5)


def test_closed_form_translation():
    # Shifting phi by exactly one voxel in normalized units shifts the image.
    D = 8
    image = np.zeros((1, 1, D, D, D), dtype=np.float32)
    image[0, 0, 3, 4, 5] = 1.0
    phi = coords.identity_map_np((D, D, D))[None].copy()
    phi[:, 0] += 2.0 / (D - 1)  # sample one voxel further along axis 0
    out = np.asarray(resample.warp_image(jnp.asarray(image), jnp.asarray(phi),
                                         scale_intensity=False))
    assert out[0, 0, 2, 4, 5] == pytest.approx(1.0, abs=1e-5)
    assert out.sum() == pytest.approx(1.0, abs=1e-4)


def test_grid_sample_2d_matches_torch():
    rng = np.random.default_rng(2)
    B, C, Hh, Ww = 3, 2, 13, 17
    img = rng.normal(size=(B, C, Hh, Ww)).astype(np.float32)
    grid_norm = rng.uniform(-1.3, 1.3, size=(B, 5, 7, 2)).astype(np.float32)

    # torch order: grid[..., 0] indexes W (last axis), grid[..., 1] indexes H.
    want = F.grid_sample(torch.from_numpy(img), torch.from_numpy(grid_norm),
                         mode="bilinear", padding_mode="zeros",
                         align_corners=True).numpy()
    ours = np.asarray(resample.grid_sample_normalized(
        jnp.asarray(img), jnp.asarray(grid_norm[..., ::-1]),
        mode="bilinear", padding="zeros"))
    np.testing.assert_allclose(ours, want, rtol=2e-5, atol=2e-5)


def test_resize_nearest_matches_torch():
    rng = np.random.default_rng(3)
    img = rng.normal(size=(2, 4, 9, 11)).astype(np.float32)
    want = F.interpolate(torch.from_numpy(img), size=[16, 16]).numpy()
    got = np.asarray(resample.resize_nearest_2d(jnp.asarray(img), (16, 16)))
    np.testing.assert_allclose(got, want)


def test_resize_trilinear_matches_torch():
    rng = np.random.default_rng(4)
    vol = rng.normal(size=(2, 3, 5, 6, 7)).astype(np.float32)
    want = F.interpolate(torch.from_numpy(vol), scale_factor=2,
                         mode="trilinear", align_corners=True).numpy()
    got = np.asarray(resample.resize_trilinear(jnp.asarray(vol), (10, 12, 14)))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_warp_gradients_match_finite_differences():
    """The pairs-buffer fast path must have a correct VJP (training relies
    on gradients through the warp wrt both image and map)."""
    import jax
    rng = np.random.default_rng(7)
    D = 7
    image = jnp.asarray(rng.uniform(-1, 1, (1, 1, D, D, D)).astype(np.float32))
    phi0 = jnp.asarray((coords.identity_map_np((D, D, D))[None]
                        + rng.uniform(-0.2, 0.2, (1, 3, D, D, D))
                        ).astype(np.float32))

    def loss_img(img):
        return jnp.sum(resample.warp_image(img, phi0) ** 2)

    def loss_phi(phi):
        return jnp.sum(resample.warp_image(image, phi) ** 2)

    for fn, arg in ((loss_img, image), (loss_phi, phi0)):
        g = jax.grad(fn)(arg)
        # check 3 random entries against central differences
        flat = np.asarray(arg).reshape(-1)
        gflat = np.asarray(g).reshape(-1)
        idxs = rng.choice(flat.size, 3, replace=False)
        for i in idxs:
            eps = 1e-3
            ap = flat.copy(); ap[i] += eps
            am = flat.copy(); am[i] -= eps
            fd = (float(fn(jnp.asarray(ap.reshape(arg.shape))))
                  - float(fn(jnp.asarray(am.reshape(arg.shape))))) / (2 * eps)
            assert gflat[i] == pytest.approx(fd, rel=5e-2, abs=2e-2)


def test_oct_bf16_serving_warp():
    """1-gather bf16-tap warp: within bf16 tolerance of the exact path,
    including zeros/border boundary handling."""
    import jax.numpy as jnp
    from liftreg_tpu.ops import resample

    rng = np.random.default_rng(5)
    B, sz = 2, 12
    vol = jnp.asarray(rng.uniform(-1, 1, (B, 1, sz, sz, sz))
                      .astype(np.float32))
    # coords pushing past every face to exercise boundary handling
    grid = jnp.asarray(rng.uniform(-1.3, 1.3, (B, sz, sz, sz, 3))
                       .astype(np.float32))
    for padding in ("zeros", "border"):
        exact = resample.grid_sample_normalized(vol, grid, padding=padding)
        fast = resample.grid_sample_normalized(vol, grid, padding=padding,
                                               taps_dtype=jnp.bfloat16)
        err = float(jnp.abs(exact - fast).max())
        assert err < 2e-2, (padding, err)
        # exactly-representable volume (integers) -> bf16 taps are exact
        voli = jnp.asarray(
            rng.integers(-8, 8, (B, 1, sz, sz, sz)).astype(np.float32))
        e2 = resample.grid_sample_normalized(
            voli, grid, padding=padding, taps_dtype=jnp.bfloat16)
        r2 = resample.grid_sample_normalized(voli, grid, padding=padding)
        np.testing.assert_allclose(np.asarray(e2), np.asarray(r2),
                                   atol=2e-5)


def test_custom_vjp_matches_plain_ad():
    """The no-re-gather custom VJP (quad + oct paths) must produce the
    same gradients as plain AD of the identical forward computation
    (resample._quad_impl / _oct_impl differentiated directly), for both
    image and map cotangents, both paddings, C>1, and B>1."""
    import jax
    rng = np.random.default_rng(11)
    D = 9
    B, C = 2, 2
    vol = jnp.asarray(rng.uniform(-1, 1, (B, C, D, D, D)).astype(np.float32))
    # coords past every face to exercise boundary/clip gradient paths
    cs = jnp.asarray((coords.identity_map_np((D, D, D))[None]
                      + rng.uniform(-0.4, 0.4, (B, 3, D, D, D))
                      ).astype(np.float32))
    # map convention -> pixel coords (B, D, D, D, 3)
    px = jnp.moveaxis((cs + 1.0) / 2.0 * (D - 1), 1, -1)

    for padding in ("zeros", "border"):
        # primal equality: default path (_quad_plain, the original body),
        # restructured impl, and the custom-VJP primal all agree
        a = resample._quad_plain(vol, px, padding)
        b = resample._quad_impl(padding, vol, px)[0]
        cq = resample._quad_sample(padding, vol, px)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(a), np.asarray(cq),
                                   rtol=1e-6, atol=1e-6)
        ao = resample._oct_plain(vol[:1], px[:1], padding)
        bo = resample._oct_sample(padding, vol[:1], px[:1]).reshape(ao.shape)
        np.testing.assert_allclose(np.asarray(ao), np.asarray(bo),
                                   rtol=1e-6, atol=1e-6)

        def f_custom(v, p):
            return jnp.sum(resample._quad_sample(padding, v, p) ** 2)

        def f_plain(v, p):
            return jnp.sum(resample._quad_impl(padding, v, p)[0] ** 2)

        def o_custom(v, p):
            return jnp.sum(resample._oct_sample(padding, v, p) ** 2)

        def o_plain(v, p):
            return jnp.sum(resample._oct_impl(padding, v, p)[0] ** 2)

        v1, p1 = vol[:1], px[:1]

        # one compile for all 8 grad graphs (16 separate jax.grad calls
        # dominated the fast suite at ~27s on the 1-core CPU)
        @jax.jit
        def all_grads(v, p, v1, p1):
            quad = {(f, a): jax.grad(fn, argnums=a)(v, p)
                    for f, fn in (("custom", f_custom), ("plain", f_plain))
                    for a in (0, 1)}
            oct_ = {(f, a): jax.grad(fn, argnums=a)(v1, p1)
                    for f, fn in (("custom", o_custom), ("plain", o_plain))
                    for a in (0, 1)}
            return quad, oct_

        quad, oct_ = all_grads(vol, px, v1, p1)
        for argnum in (0, 1):
            np.testing.assert_allclose(
                np.asarray(quad[("custom", argnum)]),
                np.asarray(quad[("plain", argnum)]),
                rtol=1e-5, atol=1e-5,
                err_msg=f"quad {padding} arg{argnum}")
            # image grad (arg0): plain AD quantizes the cotangent to bf16
            # when scattering into the bf16 oct buffer; the custom VJP
            # accumulates in f32 (strictly more accurate), so the two
            # agree only to bf16 resolution there
            tol = 2e-2 if argnum == 0 else 1e-4
            np.testing.assert_allclose(
                np.asarray(oct_[("custom", argnum)]),
                np.asarray(oct_[("plain", argnum)]),
                rtol=tol, atol=tol,
                err_msg=f"oct {padding} arg{argnum}")
