"""Dense 3D-3D deformable registration by per-pair optimization.

The LiftReg premise is that simulated training data provides CT-CT image
pairs, so a "high-quality CT-CT image similarity measure" can supervise the
deformation space (reference ``README.md:10-11``). The statistical
deformation subspace the reference consumes prebuilt (``pca_vectors.npy``,
``README.md:34-36``) is PCA over dense 3D-3D deformations of the training
set — the repo ships no tool to produce them. This module is that tool's
core: classical multi-level deformable registration of a CT pair, written
the TPU way.

TPU-native shape: the unknowns are a COARSE displacement control grid
(B, 3, g, g, g) — a few hundred thousand parameters instead of 3·160³ —
trilinearly upsampled to full resolution inside the objective. Each level
is ONE jitted program: an ``optax.adam`` loop in a ``lax.scan`` (static
step count), reusing :func:`liftreg_tpu.refine._build_refine` — the same
per-sample best-iterate machinery as instance refinement, with the PCA
expansion swapped for ``jax.image.resize``. Batches of pairs run together,
so the full train split registers in a handful of compiles.

The coarse grid is both the memory saver and the capture-radius lever: a
level-0 grid of ~8³ can only express smooth, large-scale motion (NCC stays
in its basin), and each subsequent level doubles the grid with the previous
best iterate as warm start — the classic pyramid, expressed as parameter
resolution instead of image resolution so every level scores the similarity
at full resolution on the MXU-friendly volume.

Typical use (basis construction; ``tools/build_pca.py --from_optreg``)::

    reg = DenseRegisterer((160,160,160), levels=((10, 80, 0.04),
                                                 (20, 60, 0.02),
                                                 (40, 60, 0.01)))
    out = reg(moving_masked, target_masked)   # dict: disp, phi, warped, ...
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from .coords import identity_map
from .losses.registration import displacement_reg
from .losses.similarity import get_similarity
from .ops import resample
from .refine import _build_refine


def upsample_grid(z, img_sz):
    """(B, 3, g, g, g) control grid -> (B, 3, D, W, H) displacement."""
    B = z.shape[0]
    return jax.image.resize(z, (B, 3) + tuple(img_sz), method="linear")


def make_level(img_sz, grid_sz, sim="ncc", sim_opts=None, n_steps=60,
               lr=0.02, reg_factor=1e-3, warp_taps_dtype=None, mesh=None):
    """One pyramid level: jitted adam over a (B, 3, g, g, g) control grid.

    Returns ``refine(z0, moving, target) -> dict`` with the
    :func:`refine._build_refine` contract (``coefs`` = best control grid,
    ``phi``/``warped`` at full resolution, per-sample best-iterate
    selection, ``history[-1] <= history[0]``).
    """
    img_sz = tuple(int(s) for s in img_sz)
    sim_fn = get_similarity(sim)
    if sim_opts:
        sim_fn = functools.partial(sim_fn, **dict(sim_opts))
    del grid_sz  # shape is carried by z0; kept for call-site clarity

    def _losses(z, moving, target):
        disp = upsample_grid(z, img_sz)
        phi = disp + identity_map(img_sz)[None]
        warped = resample.warp_image(moving, phi, zero_boundary=True,
                                     scale_intensity=True,
                                     taps_dtype=warp_taps_dtype, mesh=mesh)
        sim_loss = sim_fn(warped, target, reduction="none")        # (B,)
        total = sim_loss + reg_factor * displacement_reg(
            disp, reduction="none")
        return total, (sim_loss, phi, warped)

    return _build_refine(_losses, optax.adam(lr), n_steps)


class DenseRegisterer:
    """Multi-level dense 3D-3D registration, one jitted program per level.

    Args:
      img_sz: (D, W, H) of the volumes.
      levels: sequence of ``(grid, n_steps, lr)`` — control-grid edge size,
        adam steps, and learning rate per level, coarse to fine. Between
        levels the best iterate is trilinearly upsampled as the next warm
        start.
      sim / sim_opts: similarity (full-resolution CT-CT, e.g. ``"ncc"``).
      reg_factor: weight of ``||grad disp||^2`` on the FULL-RES field.
      warp_taps_dtype / mesh: forwarded to the warp (see
        :func:`refine.make_refiner`).

    Calling with ``(B, 1, D, W, H)`` moving/target returns the LAST
    level's output dict plus ``disp`` (full-resolution displacement,
    ``phi - identity``) and ``z`` (the final control grid). Jitted
    programs are cached per (level shape); every same-shaped batch reuses
    them.
    """

    def __init__(self, img_sz, levels=((10, 80, 0.04), (20, 60, 0.02),
                                       (40, 60, 0.01)),
                 sim="ncc", sim_opts=None, reg_factor=1e-3,
                 warp_taps_dtype=None, mesh=None):
        self.img_sz = tuple(int(s) for s in img_sz)
        self.levels = tuple((int(g), int(n), float(lr))
                            for g, n, lr in levels)
        self._mk = functools.lru_cache(maxsize=None)(
            lambda g, n, lr: make_level(
                self.img_sz, g, sim=sim, sim_opts=sim_opts, n_steps=n,
                lr=lr, reg_factor=reg_factor,
                warp_taps_dtype=warp_taps_dtype, mesh=mesh))

    def __call__(self, moving, target):
        B = moving.shape[0]
        g0 = self.levels[0][0]
        z = jnp.zeros((B, 3, g0, g0, g0), jnp.float32)
        out = None
        for g, n_steps, lr in self.levels:
            if z.shape[2] != g:
                z = jax.image.resize(z, (B, 3, g, g, g), method="linear")
            out = self._mk(g, n_steps, lr)(z, moving, target)
            z = out["coefs"]
        idm = identity_map(self.img_sz)[None]
        out["disp"] = out["phi"] - idm
        out["z"] = z
        return out
