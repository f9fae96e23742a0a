"""Regression pin for the LNCC sub-voxel blur pathology and its fix.

Windowed correlation of band-limited texture has a coherent sub-voxel
pathology (DESIGN.md "LNCC at production scale"): starting from the
grid-aligned identity, a small step of a smooth deformation field
de-sharpens every trilinear sample in phase, so raw LNCC's exact
directional derivative along the ground-truth direction is *positive*
(points away from alignment) even though the coarse landscape decreases.
The ``smooth=`` scale-space pre-filter removes the blur-cycle term.

This test reconstructs the setting at 32^3 (band-limited 4-voxel texture
in a blob, smooth ~2-voxel deformation) and pins both halves:
  * the smoothed directional derivative is negative (descends toward GT);
  * the coarse landscape decreases for both variants (signal exists), so
    a raw derivative that is positive/noisy is the pathology, not absent
    signal.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from liftreg_tpu import coords
from liftreg_tpu.losses.similarity import lncc_loss
from liftreg_tpu.ops import resample


@pytest.fixture(scope="module")
def setting():
    sz = 32
    rng = np.random.default_rng(0)
    low = rng.normal(size=(sz // 4,) * 3).astype(np.float32)
    tex = np.asarray(resample.resize_trilinear(
        jnp.asarray(low)[None, None], (sz,) * 3))[0, 0]
    zz, yy, xx = np.mgrid[0:sz, 0:sz, 0:sz].astype(np.float32)
    blob = (((zz - sz / 2) / (0.4 * sz)) ** 2
            + ((yy - sz / 2) / (0.4 * sz)) ** 2
            + ((xx - sz / 2) / (0.4 * sz)) ** 2) < 1
    img = np.where(blob, 0.2 * tex, -1.0).astype(np.float32)
    dl = rng.normal(size=(3, sz // 8, sz // 8, sz // 8)).astype(np.float32)
    disp = np.stack([np.asarray(resample.resize_trilinear(
        jnp.asarray(d)[None, None], (sz,) * 3))[0, 0] for d in dl])
    disp *= 2.0 / (np.abs(disp).max() * (sz - 1) / 2)  # ~2 voxel peak
    idm = np.asarray(coords.identity_map((sz,) * 3))
    tgt = np.asarray(resample.warp_image(
        jnp.asarray(img)[None, None], jnp.asarray(idm + disp)[None],
        zero_boundary=False, scale_intensity=False))[0, 0]
    return (jnp.asarray(img)[None, None], jnp.asarray(tgt)[None, None],
            jnp.asarray(disp)[None], jnp.asarray(idm)[None])


def _loss(alpha, img, tgt, disp, idm, smooth):
    warped = resample.warp_image(img, idm + alpha * disp,
                                 zero_boundary=False, scale_intensity=False)
    return lncc_loss(warped, tgt, smooth=smooth)


def test_smoothed_lncc_descends_where_raw_gradient_fails(setting):
    img, tgt, disp, idm = setting
    grad = jax.jit(jax.grad(_loss), static_argnums=(5,))
    val = jax.jit(_loss, static_argnums=(5,))
    # signal exists for both variants: the coarse landscape decreases
    for smooth in (0, 3):
        l0 = float(val(jnp.asarray(0.0), img, tgt, disp, idm, smooth))
        l1 = float(val(jnp.asarray(1.0), img, tgt, disp, idm, smooth))
        assert l1 < l0, (smooth, l0, l1)
    # the smoothed exact derivative agrees with the landscape at
    # sub-voxel alphas (the raw one is the documented pathology — often
    # positive here; we only pin the fix, not the flaky failure sign)
    for a in (0.01, 0.03):
        g3 = float(grad(jnp.asarray(a), img, tgt, disp, idm, 3))
        assert g3 < 0.0, (a, g3)
