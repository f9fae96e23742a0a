"""LiftReg subspace model with backprojection lift (the flagship).

TPU-native re-design of ``src/liftreg/models/LiftRegDeformSubspaceBackproj.py``:
* the 2D->3D lift is the MXU backprojection of :mod:`liftreg_tpu.ops.drr`
  (instead of a cached ``grid_sample`` over per-voxel grids, reference
  ``:85-93``) and is non-differentiable by design (``.detach()``, ``:93`` —
  here ``stop_gradient``);
* a 6-stage 3D conv encoder (filters [16,32,32,32,32,32], stride 1 then 2,
  ``:20,27-33``) runs channels-last in an optional compute dtype with
  rematerialization per stage;
* the FC head 32*(D/32)^3 -> 800 -> 256 -> latent (``:34-39``);
* the latent expands through the PCA basis ``disp = coefs @ V + mean``
  (``F.linear``, ``:102``) — a thin (B,L)x(L,3*D*W*H) matmul;
* ``phi = disp + identity``; warp of the lung-masked moving image by the
  trilinear spatial transformer (``:57-58,66-69``).

Output dict keys match the reference contract (``:71-78``).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..coords import identity_map
from ..ops import drr, resample
from . import s2d
from .blocks import ConvBlock, FullyConnectBlock


class SubspaceEncoder(nn.Module):
    """Conv encoder + FC head emitting PCA coefficients.

    ``s2d_stage01`` re-lays stages 0+1 as space-to-depth convolutions
    (:mod:`liftreg_tpu.models.s2d`): numerically the same operator from
    the same parameter tree, but with MXU-friendly channel counts —
    XLA's TPU conv lowering runs the tiny-channel stage-0 ~19x above its
    HBM floor (DESIGN.md §4a) while the s2d form runs near roofline.
    """
    latent_dim: int
    enc_filters: Sequence[int] = (16, 32, 32, 32, 32, 32)
    fc_widths: Sequence[int] = (800, 256)
    dtype: Any = None
    s2d_stage01: bool = False

    @nn.compact
    def __call__(self, x):
        # x: (B, D, W, H, C) channels-last; each stage rematerialized so
        # training activations are recomputed in backward (HBM for FLOPs)
        RematConv = nn.remat(ConvBlock)
        start = 0
        if self.s2d_stage01 and s2d.eligible(x.shape, self.enc_filters):
            k0, b0 = s2d.ConvParams((3, 3, 3, x.shape[-1],
                                     self.enc_filters[0]),
                                    name="CheckpointConvBlock_0")()
            k1, b1 = s2d.ConvParams((3, 3, 3, self.enc_filters[0],
                                     self.enc_filters[1]),
                                    name="CheckpointConvBlock_1")()
            pair = jax.checkpoint(
                lambda a, p0, q0, p1, q1: s2d.conv_pair_s2d(
                    a, p0, q0, p1, q1, dtype=self.dtype))
            x = pair(x, k0, b0, k1, b1)
            start = 2
        for i, feats in enumerate(self.enc_filters):
            if i < start:
                continue
            x = RematConv(feats, stride=1 if i == 0 else 2,
                          use_bias=True, dtype=self.dtype,
                          name=f"CheckpointConvBlock_{i}")(x)
        x = x.reshape(x.shape[0], -1)
        for w in self.fc_widths:
            x = FullyConnectBlock(w, dtype=self.dtype)(x)
        x = FullyConnectBlock(self.latent_dim, nonlinear=False,
                              dtype=self.dtype)(x)
        return x.astype(jnp.float32)


def mask_lung(img, seg):
    """(img+1)*seg-1: air (-1) outside the lung mask
    (``LiftRegDeformSubspaceBackproj.py:57-58``)."""
    return (img + 1.0) * seg - 1.0


def expand_pca(coefs, pca_vectors, pca_mean, img_sz,
               precision=jax.lax.Precision.HIGHEST, use_pallas=False):
    """coefs (B, L) -> displacement (B, 3, D, W, H).

    ``pca_vectors``: (L, 3*D*W*H) — the on-disk ``pca_vectors.npy`` layout
    (used untransposed: the reference loads ``.T`` then ``F.linear`` applies
    ``.T`` again, ``:42,102``). ``pca_mean``: (3*D*W*H,).

    A bf16 ``pca_vectors`` buffer (see ``load_pca(..., dtype=)``) halves the
    dominant HBM read of this thin matmul; the product accumulates in f32
    (``preferred_element_type``) and the mean stays f32.

    ``use_pallas`` (bf16 basis only): stream every basis block exactly
    once for the whole batch (``ops/pallas_pca.py`` — the XLA lowering of
    this tiny-M matmul measured ~3.8x its HBM floor at B=4).
    """
    B = coefs.shape[0]
    if pca_vectors.dtype == jnp.bfloat16:
        if use_pallas:
            from ..ops.pallas_pca import expand_pca_streamed
            disp = expand_pca_streamed(coefs, pca_vectors, pca_mean)
        else:
            disp = jnp.dot(coefs.astype(jnp.bfloat16), pca_vectors,
                           preferred_element_type=jnp.float32) + pca_mean
    else:
        disp = jnp.dot(coefs, pca_vectors.astype(jnp.float32),
                       precision=precision) + pca_mean
    return disp.reshape(B, 3, *img_sz)


class LiftRegSubspaceBackproj(nn.Module):
    """Flagship model. ``__call__(inputs, pca)`` with
    ``pca = {'vectors': (L, 3*D*W*H), 'mean': (3*D*W*H,)}``."""
    img_sz: Sequence[int]
    latent_dim: int = 56
    drr_feature_num: int = 4
    enc_filters: Sequence[int] = (16, 32, 32, 32, 32, 32)
    compute_dtype: Any = None
    backproject_chunk: int = 16
    #: jnp.bfloat16 selects the 1-gather serving warp (bf16 tap storage,
    #: ~4e-3 relative intensity error on the warped image, map stays
    #: f32-exact; resample._trilinear_oct_bf16). None = f32-exact warp.
    warp_taps_dtype: Any = None
    #: optional jax.sharding.Mesh — shard_map the warp over its data axis
    #: so each chip warps only its own batch shard (resample.warp_image).
    mesh: Any = None
    #: route the warp through the no-re-gather custom VJP (training
    #: differentiates the warp wrt phi each step; the custom backward
    #: reuses the forward's gathered rows — resample._quad_sample_bwd).
    #: Opt-in: changes the traced program (compile-cache contract).
    fast_vjp: bool = False
    #: optional (dy_max, dx_max): route the warp through the Pallas
    #: locality kernel (ops/pallas_warp.py — volume VMEM-resident,
    #: unbounded z, windowed y/x). FORWARD-ONLY: serving use, never
    #: training (the kernel has no VJP).
    warp_plane_window: Any = None
    #: False computes sim on the raw (unmasked) CT pair: windowed
    #: similarities (LNCC) get body-scale boundary signal in every window
    #: instead of the lung-masked pair's flat background (DESIGN.md "LNCC
    #: at production scale"). True = reference behavior
    #: (``LiftRegDeformSubspaceBackproj.py:59-64``).
    mask_ct: bool = True
    #: re-lay encoder stages 0+1 as space-to-depth convs (models/s2d.py):
    #: same operator and parameter tree, MXU-friendly channel counts.
    s2d_encoder: bool = False
    #: stream the (bf16) PCA basis once for the whole batch in a Pallas
    #: kernel (ops/pallas_pca.py); requires pca_dtype=bfloat16, TPU only.
    pca_expand_pallas: bool = False

    def setup(self):
        self.encoder = SubspaceEncoder(self.latent_dim, self.enc_filters,
                                       dtype=self.compute_dtype,
                                       s2d_stage01=self.s2d_encoder)

    def lift(self, target_proj, poses):
        """Backproject P projections into P feature volumes; gradient stopped
        as in the reference (``:93``). Grids derive from the first batch
        element's poses, matching the reference's one-time cache (``:85-87``)."""
        B = target_proj.shape[0]
        vols = drr.backproject(target_proj, poses,
                               tuple(int(s) for s in self.img_sz),
                               plane_chunk=self.backproject_chunk)
        return jax.lax.stop_gradient(vols)  # (B, P, D, W, H)

    def __call__(self, inputs, pca):
        moving = inputs["source"]            # (B, 1, D, W, H)
        target = inputs["target"]
        target_proj = inputs["target_proj"]  # (B, P, pw, ph)
        poses = inputs["target_poses"]       # (B, P, 3) or (P, 3)
        if poses.ndim == 3:
            poses = poses[0]
        if self.mask_ct and "source_label" in inputs:
            moving_cp = mask_lung(moving, inputs["source_label"])
            target_cp = mask_lung(target, inputs["target_label"])
        else:
            moving_cp, target_cp = moving, target

        lifted = self.lift(target_proj, poses)
        x = jnp.concatenate([moving, lifted], axis=1)   # (B, 1+P, D, W, H)
        x = jnp.moveaxis(x, 1, -1)                      # channels-last
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
            "target_proj": target_proj,
            # reference quirk: ``warped_proj`` echoes the target projections
            # (``LiftRegDeformSubspaceBackproj.py:77``)
            "warped_proj": target_proj,
        }
