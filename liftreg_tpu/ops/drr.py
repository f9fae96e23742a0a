"""Digitally-reconstructed-radiograph (DRR) projector and backprojector.

TPU-first redesign of the reference's ray-casting geometry
(``src/liftreg/utils/sdct_projection_utils.py``). The reference evaluates a
cone-beam line integral by building a per-ray/per-plane sample grid and
calling ``grid_sample`` over the whole volume (``:15-57,59-100``), and lifts
2D projections to 3D with a per-voxel ``grid_sample`` (``:227-250``) — both
are scattered gathers, which TPUs dislike.

Key observation making this MXU-native: with the reference's geometry the
ray/plane intersection coordinates are **separable** — the axial coordinate
of a sample depends only on (detector-x, plane) and the sagittal coordinate
only on (detector-z, plane). A bilinear 2D resample on a separable grid is a
pair of matmuls with 2-tap interpolation matrices:

    proj[p,u,v] = 0.1*dx[p,u,v] * sum_k  Rx[p,k] @ vol[:,k,:] @ Rz[p,k]^T

and likewise the backprojection. The weight ``relu(1 - |x - j|)`` over the
integer grid ``j`` reproduces torch's bilinear interpolation *including*
``zeros`` padding (out-of-range taps vanish) bit-for-bit in exact arithmetic.

Geometry replicated from the reference (all in voxel units):
* detector grid ``lin_x = linspace(-R/2, R/2-1, R)`` (``:32-33``);
* emitter poses ``y=3.5*W``, ``x=tan(+-range/2)*3*W``, ``z=+-0.2*W``
  (``calculate_projection_wraper:138-159``);
* per-ray path length ``dx = ||(ray/ray_y) * spacing||`` (mm/plane-step,
  ``:39-41``), final scale 0.1 mm->cm (``:85``);
* forward normalization ``x/D*2`` (axes 0,2) and ``y/(W-1)*2-1`` (axis 1)
  (``:54-56``) which in pixel space is ``x_pix=(x/D+0.5)*(D-1)``, ``y_pix=y``;
* backprojection's reversed coronal axis ``y = W-1-j`` (``:233``) and
  normalization ``u/proj_w*2`` (``:247-248``), i.e.
  ``u_pix=(u/proj_w+0.5)*(proj_w-1)``.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# HU -> attenuation
# ---------------------------------------------------------------------------

def calc_relative_atten_coef(img):
    """HU -> linear attenuation, water=0.2/cm (``sdct_projection_utils.py:6-13``)."""
    img = jnp.maximum(img, -1000.0)
    return (img + 1000.0) / 1000.0 * 0.2


def normalize_drr(proj):
    """DRR clip [0, 6] -> [-1, 1] — the dataset's stored-projection
    normalization (``Registration2D3DDataset.py:95-96``). THE single
    definition; ``pipeline.normalize_drr`` and the projection refiner
    import it."""
    return jnp.clip(proj, 0.0, 6.0) / 6.0 * 2.0 - 1.0


def calc_relative_atten_coef_preprocessing(img):
    """The preprocessing tool's unit-less variant: ``(clip(img,-1024)+1024)/1024``
    (``tools/preprocessing.py:119-122``)."""
    img = jnp.maximum(img, -1024.0)
    return (img + 1024.0) / 1024.0


# ---------------------------------------------------------------------------
# Pose synthesis
# ---------------------------------------------------------------------------

def synthesize_poses(scan_range_deg, n_proj, width, emitter_y_scale=3.5):
    """Limited-angle emitter poses in voxel units, ``(P, 3)`` numpy.

    ``calculate_projection_wraper`` (``sdct_projection_utils.py:138-159``):
    y = 3.5*W, x = tan(linspace(-r/2, r/2))*3*W, z = linspace(-0.2,0.2)*W.
    The legacy hard-coded backprojection grids use ``emitter_y_scale=3.0``
    (``backproj_grids:179-185``).
    """
    half = scan_range_deg / 2.0
    poses = np.zeros((n_proj, 3), dtype=np.float64)
    poses[:, 1] = emitter_y_scale
    poses[:, 0] = np.tan(np.linspace(-half, half, num=n_proj) / 180.0 * np.pi) * 3.0
    poses[:, 2] = np.linspace(-0.2, 0.2, num=n_proj)
    return (poses * width).astype(np.float32)


def poses_from_geometry_csv(csv_path, spacing):
    """Physical emitter positions (mm, CSV with header) -> voxel units
    (``calculate_projection_wraper_with_geo_csv_file``, ``:161-177``)."""
    geo = np.genfromtxt(csv_path, delimiter=",")[1:]
    return (geo / np.asarray(spacing)).astype(np.float32)


def default_resolution(vol_shape, scale=1.5):
    """Detector resolution default (``sdct_projection_utils.py:149-152``)."""
    return (int(vol_shape[0] * scale), int(vol_shape[2] * scale))


# ---------------------------------------------------------------------------
# Interpolation-matrix builders (pose-dependent, volume-independent)
# ---------------------------------------------------------------------------

def _two_tap_matrix(pix, n):
    """``relu(1 - |pix[..., None] - arange(n)|)``: 2-tap linear interpolation
    rows with implicit zeros padding. pix: (...,) -> (..., n)."""
    grid = jnp.arange(n, dtype=pix.dtype)
    return jnp.maximum(0.0, 1.0 - jnp.abs(pix[..., None] - grid))


def forward_matrices(poses, vol_shape, resolution, spacing,
                     dtype=jnp.float32):
    """Build (Rx, Rz, dx) for :func:`project`.

    Returns:
      Rx: ``(P, W, res_d, D)``; Rz: ``(P, W, res_h, H)``;
      dx: ``(P, res_d, res_h)`` path length per plane step in mm.
    """
    D, W, H = [int(s) for s in vol_shape]
    res_d, res_h = [int(r) for r in resolution]
    poses = jnp.asarray(poses, dtype=dtype)                      # (P, 3)
    spacing = jnp.asarray(spacing, dtype=dtype)                  # (3,)

    lin_x = jnp.linspace(-res_d / 2.0, res_d / 2.0 - 1.0, res_d, dtype=dtype)
    lin_y = jnp.linspace(-res_h / 2.0, res_h / 2.0 - 1.0, res_h, dtype=dtype)
    planes = jnp.linspace(0.0, W - 1.0, W, dtype=dtype)          # (W,)

    ex, ey, ez = poses[:, 0], poses[:, 1], poses[:, 2]
    # Ray through detector point (lin_x, 0, lin_y); plane y = k intersection:
    # p = E + (k - ey)/(0 - ey) * (detector - E)
    s = (planes[None, :] - ey[:, None]) / (-ey[:, None])         # (P, W)
    px = ex[:, None, None] + s[:, :, None] * (lin_x[None, None, :] - ex[:, None, None])
    pz = ez[:, None, None] + s[:, :, None] * (lin_y[None, None, :] - ez[:, None, None])
    # Pixel coords per the reference's /N*2 normalization (axes 0 and 2).
    x_pix = (px / D + 0.5) * (D - 1.0)                           # (P, W, res_d)
    z_pix = (pz / H + 0.5) * (H - 1.0)                           # (P, W, res_h)

    Rx = _two_tap_matrix(x_pix, D)                               # (P, W, res_d, D)
    Rz = _two_tap_matrix(z_pix, H)                               # (P, W, res_h, H)

    # Path length per unit plane step (mm): || (ray / ray_y) * spacing ||.
    rx = (lin_x[None, :] - ex[:, None]) / (-ey[:, None])         # (P, res_d)
    rz = (lin_y[None, :] - ez[:, None]) / (-ey[:, None])         # (P, res_h)
    dx = jnp.sqrt((rx[:, :, None] * spacing[0]) ** 2
                  + spacing[1] ** 2
                  + (rz[:, None, :] * spacing[2]) ** 2)          # (P, res_d, res_h)
    return Rx, Rz, dx


def backward_matrices(poses, vol_shape, proj_shape, dtype=jnp.float32):
    """Build (Bu, Bv) for :func:`backproject`.

    Maps every voxel (i, j, k) to its detector pixel for each pose,
    replicating ``backproj_grids_with_poses`` (``:227-250``) including the
    reversed coronal axis ``y_world = W-1-j`` (``:233``).

    Returns Bu: ``(P, W, D, proj_w)``; Bv: ``(P, W, H, proj_h)``.
    """
    D, W, H = [int(s) for s in vol_shape]
    proj_w, proj_h = [int(s) for s in proj_shape]
    poses = jnp.asarray(poses, dtype=dtype)
    ex, ey, ez = poses[:, 0], poses[:, 1], poses[:, 2]

    gx = jnp.linspace(-D / 2.0, D / 2.0 - 1.0, D, dtype=dtype)   # (D,)
    yw = jnp.linspace(W - 1.0, 0.0, W, dtype=dtype)              # (W,) reversed
    gz = jnp.linspace(-H / 2.0, H / 2.0 - 1.0, H, dtype=dtype)   # (H,)

    scale = ey[:, None] / (ey[:, None] - yw[None, :])            # (P, W)
    u3 = (gx[None, None, :] - ex[:, None, None]) * scale[:, :, None] + ex[:, None, None]
    v3 = (gz[None, None, :] - ez[:, None, None]) * scale[:, :, None] + ez[:, None, None]
    u_pix = (u3 / proj_w + 0.5) * (proj_w - 1.0)                 # (P, W, D)
    v_pix = (v3 / proj_h + 0.5) * (proj_h - 1.0)                 # (P, W, H)

    Bu = _two_tap_matrix(u_pix, proj_w)                          # (P, W, D, proj_w)
    Bv = _two_tap_matrix(v_pix, proj_h)                          # (P, W, H, proj_h)
    return Bu, Bv


# ---------------------------------------------------------------------------
# Projection / backprojection (MXU einsums, chunked over coronal planes)
# ---------------------------------------------------------------------------

def project_with_mats(vol, Rx, Rz, dx, plane_chunk=32,
                      precision=jax.lax.Precision.HIGHEST):
    """Line-integral projection using prebuilt matrices.

    vol: ``(B, D, W, H)`` attenuation -> ``(B, P, res_d, res_h)``.
    Accumulates over coronal-plane chunks to bound the intermediate
    ``(B, P, chunk, res_d, H)`` buffer (the reference instead materializes
    full sample grids, ``calculate_projection:75-81``).
    """
    B, D, W, H = vol.shape
    P = Rx.shape[0]
    res_d, res_h = Rx.shape[2], Rz.shape[2]
    nchunk = -(-W // plane_chunk)
    pad = nchunk * plane_chunk - W
    if pad:
        # Zero-weight padded planes contribute nothing.
        Rx = jnp.pad(Rx, ((0, 0), (0, pad), (0, 0), (0, 0)))
        Rz = jnp.pad(Rz, ((0, 0), (0, pad), (0, 0), (0, 0)))
        vol = jnp.pad(vol, ((0, 0), (0, 0), (0, pad), (0, 0)))

    def body(carry, inputs):
        rx_c, rz_c, vol_c = inputs  # (P,Kc,res_d,D), (P,Kc,res_h,H), (B,D,Kc,H)
        # HIGHEST precision: XLA's default truncates f32 matmul inputs to
        # bf16, which costs ~0.5% error in the line integrals.
        acc = jnp.einsum("pkud,bdkh,pkvh->bpuv", rx_c, vol_c, rz_c,
                         preferred_element_type=jnp.float32,
                         precision=precision)
        return carry + acc, None

    Rx_c = Rx.reshape(P, nchunk, plane_chunk, res_d, D).transpose(1, 0, 2, 3, 4)
    Rz_c = Rz.reshape(P, nchunk, plane_chunk, res_h, H).transpose(1, 0, 2, 3, 4)
    vol_c = vol.reshape(B, D, nchunk, plane_chunk, H).transpose(2, 0, 1, 3, 4)
    init = jnp.zeros((B, P, res_d, res_h), dtype=jnp.float32)
    total, _ = jax.lax.scan(body, init, (Rx_c, Rz_c, vol_c))
    return total * dx[None] * 0.1  # mm -> cm (reference ``:85``)


def project(vol, poses, resolution=None, spacing=(2.2, 2.2, 2.2),
            plane_chunk=32):
    """DRR projection of ``(B, D, W, H)`` (or ``(D, W, H)``) attenuation
    volumes; cf. ``calculate_projection`` (``sdct_projection_utils.py:59-100``)."""
    squeeze = vol.ndim == 3
    if squeeze:
        vol = vol[None]
    if resolution is None:
        resolution = default_resolution(vol.shape[1:])
    Rx, Rz, dx = forward_matrices(poses, vol.shape[1:], resolution, spacing,
                                  dtype=vol.dtype)
    out = project_with_mats(vol, Rx, Rz, dx, plane_chunk=plane_chunk)
    return out[0] if squeeze else out


def backproject_with_mats(proj, Bu, Bv, plane_chunk=16,
                          precision=jax.lax.Precision.HIGHEST):
    """Lift projections to per-view 3D volumes using prebuilt matrices.

    proj: ``(B, P, proj_w, proj_h)`` -> ``(B, P, D, W, H)``.
    Chunked over the coronal axis j (output axis 3).
    """
    B, P, proj_w, proj_h = proj.shape
    D, H = Bu.shape[2], Bv.shape[2]
    W = Bu.shape[1]
    nchunk = -(-W // plane_chunk)
    pad = nchunk * plane_chunk - W
    if pad:
        Bu = jnp.pad(Bu, ((0, 0), (0, pad), (0, 0), (0, 0)))
        Bv = jnp.pad(Bv, ((0, 0), (0, pad), (0, 0), (0, 0)))

    Bu_c = Bu.reshape(P, nchunk, plane_chunk, D, proj_w)
    Bv_c = Bv.reshape(P, nchunk, plane_chunk, H, proj_h)

    # statically unrolled over W-chunks, concatenated along the W axis.
    # (A lax.scan stacks chunks on a leading axis and the 6-D transpose to
    # (B,P,D,W,H) picks a (P,B)-minor layout that tile-pads 16-32x — 7.8 GB
    # of padding at B=8.)
    chunks = [jnp.einsum("pjiu,bpuv,pjkv->bpijk", Bu_c[:, c], proj,
                         Bv_c[:, c], preferred_element_type=jnp.float32,
                         precision=precision)       # (B, P, D, Kc, H)
              for c in range(nchunk)]
    vol = jnp.concatenate(chunks, axis=3)
    return vol[:, :, :, :W, :]


def backproject(proj, poses, vol_shape, plane_chunk=16):
    """Backproject ``(B, P, proj_w, proj_h)`` (or unbatched) projections into
    ``(B, P, D, W, H)`` feature volumes; cf. the lift at
    ``LiftRegDeformSubspaceBackproj.py:85-93``."""
    squeeze = proj.ndim == 3
    if squeeze:
        proj = proj[None]
    Bu, Bv = backward_matrices(poses, vol_shape, proj.shape[2:],
                               dtype=proj.dtype)
    out = backproject_with_mats(proj, Bu, Bv, plane_chunk=plane_chunk)
    return out[0] if squeeze else out
