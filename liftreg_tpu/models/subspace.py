"""LiftReg subspace model without backprojection (ablation).

Equivalent of ``src/liftreg/models/LiftRegDeformSubspace.py``: the 2D->3D
lift is a nearest-neighbor resize of each projection to (D, H) broadcast
along the coronal axis (``:62-65``; torch ``F.interpolate`` defaults to
``nearest``), otherwise identical encoder/PCA/warp.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..coords import identity_map
from ..ops import resample
from .subspace_backproj import (SubspaceEncoder, expand_pca, mask_lung)


class LiftRegSubspace(nn.Module):
    img_sz: Sequence[int]
    latent_dim: int = 56
    drr_feature_num: int = 4
    enc_filters: Sequence[int] = (16, 32, 32, 32, 32, 32)
    compute_dtype: Any = None
    #: jnp.bfloat16 selects the 1-gather serving warp (see
    #: resample._trilinear_oct_bf16); None = f32-exact warp
    warp_taps_dtype: Any = None
    #: optional jax.sharding.Mesh — shard_map the warp over its data axis
    mesh: Any = None
    #: no-re-gather custom-VJP warp (see LiftRegSubspaceBackproj.fast_vjp)
    fast_vjp: bool = False
    #: Pallas locality warp window (see LiftRegSubspaceBackproj); serving only
    warp_plane_window: Any = None
    #: False computes sim on the raw (unmasked) CT pair — same semantics
    #: as LiftRegSubspaceBackproj.mask_ct
    mask_ct: bool = True
    #: re-lay encoder stages 0+1 as space-to-depth convs (models/s2d.py)
    s2d_encoder: bool = False
    #: stream the (bf16) PCA basis once per batch (ops/pallas_pca.py)
    pca_expand_pallas: bool = False

    def setup(self):
        self.encoder = SubspaceEncoder(self.latent_dim, self.enc_filters,
                                       dtype=self.compute_dtype,
                                       s2d_stage01=self.s2d_encoder)

    def __call__(self, inputs, pca):
        moving = inputs["source"]
        target = inputs["target"]
        target_proj = inputs["target_proj"]
        if self.mask_ct and "source_label" in inputs:
            moving_cp = mask_lung(moving, inputs["source_label"])
            target_cp = mask_lung(target, inputs["target_label"])
        else:
            moving_cp, target_cp = moving, target

        D, W, H = [int(s) for s in self.img_sz]
        lifted2d = resample.resize_nearest_2d(target_proj, (D, H))  # (B,P,D,H)
        lifted = jnp.broadcast_to(lifted2d[:, :, :, None, :],
                                  lifted2d.shape[:3] + (W,) + lifted2d.shape[3:])

        x = jnp.concatenate([moving, lifted], axis=1)
        x = jnp.moveaxis(x, 1, -1)
        if self.compute_dtype is not None:
            x = x.astype(self.compute_dtype)
        coefs = self.encoder(x)

        disp = expand_pca(coefs, pca["vectors"], pca["mean"], self.img_sz,
                          use_pallas=self.pca_expand_pallas)
        phi = disp + identity_map(self.img_sz)[None]
        warped = resample.warp_image(moving_cp, phi, zero_boundary=True,
                                     scale_intensity=True,
                                     taps_dtype=self.warp_taps_dtype,
                                     mesh=self.mesh,
                                     fast_vjp=self.fast_vjp,
                                     plane_window=self.warp_plane_window)
        return {
            "warped": warped,
            "phi": phi,
            "params": disp,
            "target": target_cp,
            "pca_coefs": coefs,
        }
