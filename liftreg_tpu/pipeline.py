"""Fused inference pipeline: CT bytes -> registration, one XLA program.

The reference runs preprocessing (``tools/preprocessingDRR.py``), the lift,
the network and the warp as separate host-mediated stages. Here the whole
inference path — HU clip -> attenuation -> DRR simulation -> projection
normalization -> backprojection lift -> encoder -> PCA expansion -> warp —
is a single jitted program: a CT pair goes from raw HU arrays to a
displacement field and warped volume without host round-trips
(BASELINE.json config 1).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .models import LiftRegSubspaceBackproj
from .ops import drr


def normalize_hu(vol_hu):
    """HU clip [-1000, 0] -> [-1, 1] (``Registration2D3DDataset.py:85-87``)."""
    return jnp.clip(vol_hu, -1000.0, 0.0) / 1000.0 * 2.0 + 1.0


# re-export: the single definition lives with the projector (ops/drr.py)
normalize_drr = drr.normalize_drr


class RegistrationPipeline:
    """Build once (model + poses static), then call :meth:`register`.

    Example::

        pipe = RegistrationPipeline((160,160,160), latent_dim=56)
        warped, phi = pipe.register(params, pca, src_hu, tgt_hu,
                                    src_seg, tgt_seg)
    """

    def __init__(self, img_sz=(160, 160, 160), latent_dim=56, n_proj=4,
                 scan_range_deg=30.0, spacing=(2.2, 2.2, 2.2),
                 resolution=None, compute_dtype=None, s2d_encoder=False,
                 pca_expand_pallas=False, mesh=None, mask_ct=True,
                 warp_taps_dtype="auto", warp_plane_window=None,
                 refine_steps=0,
                 refine_lr=0.05, refine_sim="ncc", refine_sim_opts=None,
                 refine_reg_factor=1e-3, refine_domain="image",
                 refine_early_stop_patience=None, refine_early_stop_tol=1e-4,
                 refine_fast_vjp=False):
        self.img_sz = tuple(int(s) for s in img_sz)
        self.spacing = tuple(float(s) for s in spacing)
        self.resolution = tuple(resolution) if resolution is not None \
            else drr.default_resolution(self.img_sz)
        self.poses = drr.synthesize_poses(scan_range_deg, n_proj,
                                          self.img_sz[1])
        # serving config: a bf16 compute dtype also opts into the 1-gather
        # bf16-tap warp (the map stays f32; see resample._trilinear_oct_bf16)
        # unless warp_taps_dtype overrides it (the trainer allows bf16 taps
        # with an f32 encoder and vice versa — match the experiment).
        # mesh: sharded batch serving — the warp shard_maps over the mesh's
        # data axis so each chip warps only its own batch shard (the same
        # option the trainer sets; resample.warp_image mesh docstring).
        # Shard the inputs with parallel.shard_batch / batch_sharding and
        # keep B divisible by the mesh size.
        # mask_ct: must match the experiment's model.mask_ct — it changes
        # which pair the warp (and the refinement objective) sees.
        self.mesh = mesh
        if warp_taps_dtype == "auto":
            warp_taps_dtype = compute_dtype
        # warp_plane_window: (dy, dx) routes the serving warp through the
        # Pallas locality kernel (forward-only; ops/pallas_warp.py) —
        # measure the model's fields with pallas_warp.displacement_window
        # before enabling.
        self.model = LiftRegSubspaceBackproj(
            img_sz=self.img_sz, latent_dim=latent_dim,
            drr_feature_num=n_proj, compute_dtype=compute_dtype,
            warp_taps_dtype=warp_taps_dtype, s2d_encoder=s2d_encoder,
            pca_expand_pallas=pca_expand_pallas, mask_ct=mask_ct,
            warp_plane_window=warp_plane_window,
            mesh=mesh if mesh is not None and mesh.devices.size > 1
            else None)
        # optional instance refinement (refine.py): refine_steps > 0 rolls
        # an adam loop over the latent coefficients into the SAME jitted
        # program — amortized prediction + per-case optimization, one
        # compile. 0 (default) leaves the program untouched.
        # refine_domain "image": objective is sim(warped CT, target CT) —
        # training's SubspaceLoss continued per case (needs the target CT).
        # refine_domain "projection": objective is sim(DRR(warped
        # attenuation), target projections) — the CBCT-free deployment
        # scenario; also powers register_projections (no target CT at all).
        self._refiner = None
        self.refine_steps = int(refine_steps)
        self.refine_domain = refine_domain
        if refine_steps:
            if refine_domain == "image":
                from .refine import make_refiner
                self._refiner = make_refiner(
                    self.img_sz, sim=refine_sim, sim_opts=refine_sim_opts,
                    n_steps=int(refine_steps), lr=refine_lr,
                    reg_factor=refine_reg_factor,
                    warp_taps_dtype=warp_taps_dtype,
                    mesh=self.model.mesh,
                    early_stop_patience=refine_early_stop_patience,
                    early_stop_tol=refine_early_stop_tol,
                    fast_vjp=refine_fast_vjp)
            elif refine_domain == "projection":
                from .refine import make_projection_refiner
                self._refiner = make_projection_refiner(
                    self.img_sz, self.poses, self.resolution, self.spacing,
                    sim=refine_sim, sim_opts=refine_sim_opts,
                    n_steps=int(refine_steps), lr=refine_lr,
                    reg_factor=refine_reg_factor, proj_norm="drr",
                    warp_taps_dtype=warp_taps_dtype,
                    mesh=self.model.mesh,
                    early_stop_patience=refine_early_stop_patience,
                    early_stop_tol=refine_early_stop_tol,
                    fast_vjp=refine_fast_vjp)
            else:
                raise ValueError(f"refine_domain {refine_domain!r} not in "
                                 f"('image', 'projection')")
        self._warp_taps_dtype = warp_taps_dtype
        self._register = jax.jit(self._register_impl)
        self._register_proj = jax.jit(self._register_proj_impl)

    def init_params(self, rng_key, pca):
        B = 1
        sz = self.img_sz
        dummy = {
            "source": jnp.zeros((B, 1) + sz, jnp.float32),
            "target": jnp.zeros((B, 1) + sz, jnp.float32),
            "source_label": jnp.ones((B, 1) + sz, jnp.float32),
            "target_label": jnp.ones((B, 1) + sz, jnp.float32),
            "target_proj": jnp.zeros(
                (B, self.poses.shape[0]) + self.resolution, jnp.float32),
            "target_poses": jnp.asarray(self.poses)[None],
            "spacing": jnp.asarray(self.spacing)[None],
        }
        return jax.jit(self.model.init)(rng_key, dummy, pca)

    def _register_impl(self, params, pca, source_hu, target_hu,
                       source_seg, target_seg):
        # NOTE: pca (up to 2.75 GB) must be an argument — closing over it
        # captures it as a compile-time constant and compilation stalls.
        att = drr.calc_relative_atten_coef(target_hu[:, 0])
        proj = drr.project(att, self.poses, self.resolution, self.spacing)
        proj = normalize_drr(proj)
        inputs = {
            "source": normalize_hu(source_hu),
            "target": normalize_hu(target_hu),
            "target_proj": proj,
            "target_poses": jnp.asarray(self.poses)[None],
            "spacing": jnp.asarray(self.spacing)[None],
        }
        if source_seg is not None:
            inputs["source_label"] = source_seg
            inputs["target_label"] = target_seg
        out = self.model.apply(params, inputs, pca)
        if self._refiner is not None:
            return self._refine_tail(out, pca, source_hu, inputs)
        return out["warped"], out["phi"]

    def _moving_cp(self, inputs):
        from .models.subspace_backproj import mask_lung
        if self.model.mask_ct and "source_label" in inputs:
            return mask_lung(inputs["source"], inputs["source_label"])
        return inputs["source"]

    def _refine_tail(self, out, pca, source_hu, inputs):
        """Continue the objective per case from the encoder's amortized
        prediction; the refine scan inlines into the same program."""
        if self.refine_domain == "image":
            # training's pair: lung-masked CT when mask_ct
            res = self._refiner(out["pca_coefs"], pca,
                                self._moving_cp(inputs), out["target"])
            return res["warped"], res["phi"]
        # projection domain: match the measured/simulated projections with
        # the DRR of the warped attenuation volume — no target CT read
        moving_atten = drr.calc_relative_atten_coef(source_hu)
        res = self._refiner(out["pca_coefs"], pca, moving_atten,
                            inputs["target_proj"])
        # keep register()'s output contract: the warped (masked,
        # normalized) CT under the refined map, not warped attenuation
        from .ops import resample
        warped = resample.warp_image(
            self._moving_cp(inputs), res["phi"], zero_boundary=True,
            scale_intensity=True, taps_dtype=self._warp_taps_dtype,
            mesh=self.model.mesh,
            plane_window=self.model.warp_plane_window)
        return warped, res["phi"]

    def _register_proj_impl(self, params, pca, source_hu, target_proj,
                            source_seg):
        """Registration WITHOUT a target CT: the model's encoder only sees
        the moving CT and the lifted target projections (the reference's
        deployment premise, ``README.md:2-11``); the target volume enters
        training-time code paths only as an output echo, so zeros stand in
        for it here."""
        inputs = {
            "source": normalize_hu(source_hu),
            "target": jnp.zeros_like(source_hu),
            "target_proj": target_proj,
            "target_poses": jnp.asarray(self.poses)[None],
            "spacing": jnp.asarray(self.spacing)[None],
        }
        if source_seg is not None:
            inputs["source_label"] = source_seg
            inputs["target_label"] = jnp.ones_like(source_seg)
        out = self.model.apply(params, inputs, pca)
        if self._refiner is not None:
            # refine_domain "image" needs a target CT, which this entry by
            # definition does not have — raising beats silently serving an
            # unrefined program the caller believes is refined
            if self.refine_domain != "projection":
                raise ValueError(
                    "register_projections with refine_steps requires "
                    "refine_domain='projection' (image-domain refinement "
                    "needs a target CT, which this entry does not take)")
            return self._refine_tail(out, pca, source_hu, inputs)
        return out["warped"], out["phi"]

    def register(self, params, pca, source_hu, target_hu, source_seg=None,
                 target_seg=None):
        """source_hu/target_hu: (B, 1, D, W, H) HU volumes (SPR orientation);
        segs optional (B, 1, D, W, H) in {0,1}. Returns (warped, phi)."""
        return self._register(params, pca, source_hu, target_hu,
                              source_seg, target_seg)

    def register_projections(self, params, pca, source_hu, target_proj,
                             source_seg=None):
        """Register from measured projections only — no target CT exists at
        serving time (CBCT-free scenario). ``target_proj``: (B, P, pw, ph)
        in the dataset's normalized DRR convention (``normalize_drr``).
        With ``refine_steps`` and ``refine_domain="projection"``, per-case
        refinement against those projections is fused in. Returns
        ``(warped, phi)`` (same contract as :meth:`register`)."""
        return self._register_proj(params, pca, source_hu, target_proj,
                                   source_seg)
