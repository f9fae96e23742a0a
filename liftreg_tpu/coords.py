"""Single source of truth for coordinate conventions.

The reference scatters its conventions across several files (channel flips in
``net_utils.py:27-30``, per-axis normalizations in
``sdct_projection_utils.py:54-56,232-234``, y-inversions at ``:232``). Here
every convention is defined once and documented.

Conventions
-----------
* Volumes are ``(B, C, D, W, H)`` float arrays (the reference's BCDWH
  contract, ``RegistrationNet.py:152-181``). D is axial/superior-inferior,
  W is coronal/anterior-posterior (SPR: posterior->...), H is sagittal.
* A *map* (``phi``) is ``(B, 3, D, W, H)``; channel ``c`` holds the
  normalized sample coordinate along spatial axis ``c`` of the volume.
  This is the effective convention of the reference once its Bilinear
  channel flip (``net_utils.py:27-30``) is folded in.
* Normalized coordinates use ``align_corners=True`` semantics: voxel ``i``
  of an axis with ``N`` voxels sits at ``-1 + 2*i/(N-1)``; i.e. pixel
  coordinate ``p = (c + 1)/2 * (N-1)``.
* Identity maps therefore hold ``linspace(-1, 1, N)`` along each axis
  (matches ``net_utils.identity_map:59-87``: ``mgrid/(N-1)*2-1``).
* Deformations saved to disk are rescaled to ``[0, 1]``
  (``utils/utils.py:57-68``); the TRE evaluator rescales back with
  ``*2-1`` (``tools/evaluate_dir_lab.py:220``).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def identity_map(sz, dtype=jnp.float32):
    """Normalized identity map of shape ``(ndim, *sz)`` in [-1, 1].

    Mirrors ``net_utils.identity_map`` (reference ``net_utils.py:59-87``):
    axis ``d`` varies along spatial dim ``d`` as ``linspace(-1, 1, sz[d])``.
    """
    axes = [jnp.linspace(-1.0, 1.0, int(n), dtype=dtype) for n in sz]
    grids = jnp.meshgrid(*axes, indexing="ij")
    return jnp.stack(grids, axis=0)


def identity_map_np(sz, dtype=np.float32):
    axes = [np.linspace(-1.0, 1.0, int(n), dtype=dtype) for n in sz]
    grids = np.meshgrid(*axes, indexing="ij")
    return np.stack(grids, axis=0)


def norm_to_pixel(coord, n):
    """[-1,1] normalized coordinate -> pixel coordinate, align_corners=True."""
    return (coord + 1.0) * 0.5 * (n - 1.0)


def pixel_to_norm(pix, n):
    """Pixel coordinate -> [-1,1] normalized, align_corners=True."""
    return pix / (n - 1.0) * 2.0 - 1.0


def phi_to_01(phi):
    """Map in [-1,1] -> stored form in [0,1] (``utils/utils.py:64``)."""
    return (phi + 1.0) / 2.0


def phi_from_01(phi01):
    """Stored [0,1] map -> [-1,1] (``tools/evaluate_dir_lab.py:220``)."""
    return phi01 * 2.0 - 1.0


def flip_sar_to_spr(vol_np):
    """Flip axis 1 (anterior/posterior) converting SAR -> SPR orientation.

    The reference applies this in the dataset
    (``dataset/Registration2D3DDataset.py:83``) and the DRR tool
    (``tools/preprocessingDRR.py:135-136``).
    """
    return np.flip(vol_np, axis=1)
