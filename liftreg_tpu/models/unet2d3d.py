"""Dense-displacement 2D/3D registration model (VoxelMorph-style U-Net).

Equivalent of ``src/liftreg/models/previous/RegNet2D3D.py``: 5-stage encoder,
6-stage decoder with skip concatenations and align_corners trilinear
upsampling (``:63-84,115-140``), a dense flow head initialized N(0, 0.001)
(``:81-84``), a 7-step fixed-point inverse-flow iteration (``:144-147``),
warping of the attenuation volume and in-training re-projection of
warped/inverse/source volumes for projection-domain losses
(``compute_proj``, ``:161-185``).

The lift and re-projections use the MXU projector/backprojector of
:mod:`liftreg_tpu.ops.drr` instead of cached ``grid_sample`` grids.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..coords import identity_map
from ..ops import drr, resample
from . import s2d
from .blocks import ConvBlock


class RegNet2D3D(nn.Module):
    img_sz: Sequence[int]
    drr_feature_num: int = 4
    enc_filters: Sequence[int] = (16, 32, 32, 32, 32)
    dec_filters: Sequence[int] = (32, 32, 32, 32, 16, 16)
    inverse_iters: int = 7
    compute_dtype: Any = None
    backproject_chunk: int = 16
    project_chunk: int = 32
    #: optional jax.sharding.Mesh — shard_map the warps over its data axis
    mesh: Any = None
    #: rematerialize the inverse-flow scan: True re-runs the loop in
    #: backward (minimum HBM); False stores per-iteration residuals
    #: (~GBs at 160^3 B=1) to skip the recompute
    remat_inverse: bool = True
    #: re-lay encoder stages 0+1 as space-to-depth convs (models/s2d.py):
    #: same operator and parameter tree, MXU-friendly channel counts. The
    #: full-resolution stage-0 skip is recovered by unpacking.
    s2d_encoder: bool = False
    #: route the warps through the no-re-gather custom VJP
    #: (resample._quad_sample_bwd). This model differentiates warps wrt
    #: TRACED images (the inverse-flow iteration warps ``disp``; the
    #: chained ``warped_inv`` warps ``warped``), where AD's 4-wide row
    #: scatters cost ~7x the custom VJP's scalar scatter-adds
    #: (DESIGN.md section 3a: 83 vs 11.6 ns/idx). Opt-in: changes the
    #: traced program (compile-cache contract).
    fast_vjp: bool = False

    @nn.compact
    def __call__(self, inputs, pca=None):
        moving = inputs["source"]
        target = inputs["target"]
        target_proj = inputs["target_proj"]      # (B, P, pw, ph)
        poses = inputs["target_poses"]
        if poses.ndim == 3:
            poses = poses[0]
        spacing = inputs["spacing"]
        if spacing.ndim == 2:
            spacing = spacing[0]
        if "source_label" in inputs:
            moving_cp = moving * inputs["source_label"]   # (``:94``, no shift)
        else:
            moving_cp = moving

        img_sz = tuple(int(s) for s in self.img_sz)
        B = moving.shape[0]
        P = target_proj.shape[1]
        proj_shape = target_proj.shape[2:]

        # Lift: backprojection, gradient-stopped (``:105-112``).
        lifted = jax.lax.stop_gradient(
            drr.backproject(target_proj, poses, img_sz,
                            plane_chunk=self.backproject_chunk))

        x = jnp.concatenate([moving_cp, lifted], axis=1)
        x = jnp.moveaxis(x, 1, -1)
        if self.compute_dtype is not None:
            x = x.astype(self.compute_dtype)

        # rematerialized conv stages: backward recomputes activations
        # instead of keeping every full-res feature map live (HBM for FLOPs)
        RematConv = nn.remat(ConvBlock)
        n_conv = 0  # running CheckpointConvBlock_<n> counter (explicit
        # names keep the parameter tree identical across the s2d switch)
        skips = []
        start = 0
        if self.s2d_encoder and s2d.eligible(x.shape, self.enc_filters):
            f0, f1 = self.enc_filters[0], self.enc_filters[1]
            k0, b0 = s2d.ConvParams((3, 3, 3, x.shape[-1], f0),
                                    name="CheckpointConvBlock_0")()
            k1, b1 = s2d.ConvParams((3, 3, 3, f0, f1),
                                    name="CheckpointConvBlock_1")()
            y2 = jax.checkpoint(
                lambda a, p, q: s2d.conv0_s2d(
                    a, p, q, dtype=self.compute_dtype))(x, k0, b0)
            # the decoder's last skip concat needs stage-0 at full res
            skips.append(s2d.unpack_s2d(y2))
            x = jax.checkpoint(
                lambda a, p, q: s2d.conv1_s2d(
                    a, p, q, dtype=self.compute_dtype))(y2, k1, b1)
            skips.append(x)
            start, n_conv = 2, 2
        for i, feats in enumerate(self.enc_filters):
            if i < start:
                continue
            x = RematConv(feats, stride=1 if i == 0 else 2,
                          dtype=self.compute_dtype,
                          name=f"CheckpointConvBlock_{n_conv}")(x)
            n_conv += 1
            skips.append(x)

        def upsample(v):
            out_sp = tuple(2 * s for s in v.shape[1:4])
            vc = jnp.moveaxis(v, -1, 1)
            vc = resample.resize_trilinear(vc, out_sp)
            return jnp.moveaxis(vc, 1, -1)

        x = RematConv(self.dec_filters[0], dtype=self.compute_dtype,
                      name=f"CheckpointConvBlock_{n_conv}")(skips[-1])
        n_conv += 1
        for i, skip in enumerate(reversed(skips[:-1])):
            x = upsample(x)
            x = jnp.concatenate([x, skip], axis=-1)
            x = RematConv(self.dec_filters[i + 1], dtype=self.compute_dtype,
                          name=f"CheckpointConvBlock_{n_conv}")(x)
            n_conv += 1
        x = RematConv(self.dec_filters[5], dtype=self.compute_dtype,
                      name=f"CheckpointConvBlock_{n_conv}")(x)

        flow = nn.Conv(3, (3, 3, 3), padding=[(1, 1)] * 3,
                       kernel_init=nn.initializers.normal(stddev=0.001),
                       bias_init=nn.initializers.zeros,
                       dtype=self.compute_dtype)(x)
        disp = jnp.moveaxis(flow, -1, 1).astype(jnp.float32)  # (B,3,D,W,H)

        idm = identity_map(img_sz)[None]

        # Fixed-point inverse flow (``:144-147``) as a lax.scan: one warp
        # graph traced once instead of ``inverse_iters`` unrolled copies
        # (a 7x trace reduction — part of making 160^3 compile tractable,
        # VERDICT r2 #4), rematerialized so backward re-runs the loop
        # instead of storing 7 intermediate volumes.
        def inv_step(disp_inv, _):
            nxt = -resample.warp_image(disp, idm + disp_inv,
                                       zero_boundary=True,
                                       scale_intensity=False,
                                       mesh=self.mesh,
                                       fast_vjp=self.fast_vjp)
            return nxt, None

        if self.remat_inverse:
            inv_step = jax.checkpoint(inv_step)
        disp_inv, _ = jax.lax.scan(inv_step, jnp.zeros_like(disp), None,
                                   length=self.inverse_iters)
        phi = disp + idm

        moving_origin = inputs["original_source"]   # attenuation volume
        warped = resample.warp_image(moving_origin, phi, zero_boundary=True,
                                     scale_intensity=False, mesh=self.mesh,
                                     fast_vjp=self.fast_vjp)
        warped_inv = resample.warp_image(warped, idm + disp_inv,
                                         zero_boundary=True,
                                         scale_intensity=False,
                                         mesh=self.mesh,
                                         fast_vjp=self.fast_vjp)

        # Re-projection for projection-domain losses (``:157-185``).
        Rx, Rz, dx = drr.forward_matrices(poses, img_sz, proj_shape, spacing)

        def compute_proj(vol):
            p = drr.project_with_mats(vol[:, 0], Rx, Rz, dx,
                                      plane_chunk=self.project_chunk)
            lo, hi = jnp.min(p), jnp.max(p)
            return (p - lo) / (hi - lo) * 2.0 - 1.0   # (``:170``)

        warped_proj = compute_proj(warped)
        warped_proj_inv = compute_proj(warped_inv)
        source_proj = compute_proj(moving_origin)

        return {
            "warped": warped,
            "phi": phi,
            "target": target,   # subspace-model output convention; lets
            # image-domain losses (RegNetImageLoss) read the pair from the
            # output dict alone. Unread keys are DCE'd by XLA.
            "params": [disp, disp_inv],
            "warped_proj": warped_proj,
            "warped_proj_inv": warped_proj_inv,
            "source_proj": source_proj,
            "target_proj": target_proj,
        }
