"""Instance-level refinement: test-time optimization in the PCA subspace.

The subspace parameterization makes per-case refinement nearly free: a
registration is 56 latent coefficients, so optimizing the *instance* after
the amortized encoder prediction is gradient descent over a (B, L) vector —
the expensive operators per step are one PCA expansion (thin matmul) and
one warp, identical to a training forward. The reference has no equivalent
(its pipeline stops at the network prediction; ``eval.py:35-49``).

TPU-native shape: the whole refinement is ONE jitted program — an
``optax.adam`` loop rolled into ``lax.scan`` (static step count, no
data-dependent Python control flow), differentiating only through
``expand_pca`` + warp + similarity. The objective mirrors training
(``SubspaceLoss``): ``sim(warped, target) + reg_factor * ||grad disp||^2``,
so refinement continues the same optimization the trainer ran, per case.

Typical use (after :meth:`RegistrationPipeline.register`, or standalone on
a trainer's model output)::

    refiner = make_refiner((160,160,160), n_steps=30)
    res = refiner(coefs0, pca, moving_masked, target_masked)
    res["phi"], res["warped"], res["sim_history"]  # (n_steps+1,) losses
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from .coords import identity_map
from .losses.registration import displacement_reg
from .losses.similarity import get_similarity
from .models.subspace_backproj import expand_pca
from .ops import drr, resample


def _build_refine(losses_fn, tx, n_steps, early_stop_patience=None,
                  early_stop_tol=1e-4):
    """Shared refinement loop: ``n_steps`` adam updates in a ``lax.scan``,
    returning PER SAMPLE the best iterate by that sample's objective (adam
    can overshoot near convergence, and one diverging batch element must
    not drag the others' selection — each case independently can never end
    worse than its amortized prediction).

    ``losses_fn(z, *args) -> (per_sample_total (B,), (per_sample_sim (B,),
    phi, warped))``; gradients are taken through the batch mean (identical
    to the batched-scalar gradient). The returned ``refine(coefs0, *args)``
    evaluates z_0..z_n inside the scan (the batch-mean trajectory is the
    history's first n_steps entries), then one final forward on the
    selected per-sample iterates yields the outputs and the history's last
    entry. Selection uses ``where(total_i < best_i)`` — NaN totals never
    enter ``best`` (``x < NaN`` is False), so a blown-up step cannot freeze
    selection.

    ``early_stop_patience=k`` swaps the scan for a ``lax.while_loop`` that
    exits once NO sample has improved its best total by more than
    ``early_stop_tol`` for ``k`` consecutive steps — converged requests
    stop paying ~209 ms/step (VERDICT r3 #4); the best-iterate guarantee
    is unchanged because selection logic is identical. History entries
    past the exit step hold NaN. Default off: the while_loop is a
    different traced program (compile-cache contract).
    """

    def _step_math(z, opt_state, best_z, best_total, grad_fn):
        (total, (per_total, (per_sim, _, _))), g = grad_fn(z)
        better = per_total < best_total                # (B,), False on NaN
        # broadcast the (B,) mask over z's trailing dims — z is (B, L)
        # for subspace refinement, (B, 3, g, g, g) for optreg grids
        best_z = jnp.where(
            better.reshape((-1,) + (1,) * (z.ndim - 1)), z, best_z)
        new_best = jnp.where(better, per_total, best_total)
        updates, opt_state = tx.update(g, opt_state, z)
        z = optax.apply_updates(z, updates)
        return z, opt_state, best_z, new_best, total, jnp.mean(per_sim), \
            per_total

    @jax.jit
    def refine(coefs0, *args):
        def mean_loss(z):
            per_total, aux = losses_fn(z, *args)
            return jnp.mean(per_total), (per_total, aux)

        grad_fn = jax.value_and_grad(mean_loss, has_aux=True)
        z0 = coefs0.astype(jnp.float32)
        B = z0.shape[0]

        if early_stop_patience is None:
            def step(carry, _):
                z, opt_state, best_z, best_total = carry
                z, opt_state, best_z, best_total, total, msim, _ = \
                    _step_math(z, opt_state, best_z, best_total, grad_fn)
                return (z, opt_state, best_z, best_total), (total, msim)

            init = (z0, tx.init(z0), z0,
                    jnp.full((B,), jnp.inf, jnp.float32))
            # n_steps + 1 evals covers z_0 (unrefined) through z_n (fully
            # stepped); the last update's result is evaluated, not discarded
            (_, _, best_z, _), (totals, sims) = jax.lax.scan(
                step, init, None, length=n_steps + 1)
            steps_run = None
        else:
            patience = int(early_stop_patience)
            nan = jnp.full((n_steps + 1,), jnp.nan, jnp.float32)

            def cond(carry):
                _, _, _, _, i, stale, _, _ = carry
                return jnp.logical_and(i < n_steps + 1, stale < patience)

            def body(carry):
                z, opt_state, best_z, best_total, i, stale, totals, sims \
                    = carry
                z, opt_state, best_z, new_best, total, msim, per_total = \
                    _step_math(z, opt_state, best_z, best_total, grad_fn)
                # "improved" counts only significant movement of any
                # sample's best; the best tracking itself stays strict
                improved = jnp.any(per_total
                                   < best_total - early_stop_tol)
                stale = jnp.where(improved, 0, stale + 1)
                totals = totals.at[i].set(total)
                sims = sims.at[i].set(msim)
                return (z, opt_state, best_z, new_best, i + 1, stale,
                        totals, sims)

            init = (z0, tx.init(z0), z0,
                    jnp.full((B,), jnp.inf, jnp.float32),
                    jnp.asarray(0), jnp.asarray(0), nan, nan)
            (_, _, best_z, _, i, _, totals, sims) = jax.lax.while_loop(
                cond, body, init)
            steps_run = i

        sel_total, (sel_sim, phi, warped) = losses_fn(best_z, *args)
        out = {
            "coefs": best_z,
            "phi": phi,
            "warped": warped,
            # entries 0..n-1: batch-mean z_0..z_{n-1} trajectory; last
            # entry: the SELECTED iterates' batch-mean objective
            # (<= entry 0 per sample, hence also in the mean)
            "total_history": jnp.concatenate(
                [totals[:-1], jnp.mean(sel_total)[None]]),
            "sim_history": jnp.concatenate(
                [sims[:-1], jnp.mean(sel_sim)[None]]),
            # per-sample selected objectives, for per-case reporting
            "total_per_sample": sel_total,
            "sim_per_sample": sel_sim,
        }
        if steps_run is not None:
            out["steps_run"] = steps_run
        return out

    return refine


def make_refiner(img_sz, sim="ncc", sim_opts=None, n_steps=30, lr=0.05,
                 reg_factor=1e-3, warp_taps_dtype=None, mesh=None,
                 fast_vjp=False, early_stop_patience=None,
                 early_stop_tol=1e-4):
    """Build a jitted refinement function for one volume geometry.

    Args:
      img_sz: (D, W, H) of the volumes.
      sim: similarity key (``losses.similarity.get_similarity``) — use the
        one the model was trained with. Note ``"ngf"`` is the reference's
        2D projection loss and only fits :func:`make_projection_refiner`
        (volumes are 5D; NGF's gradient is 2D, ``layers/losses.py:31-58``).
      sim_opts: optional kwargs for the similarity (e.g. LNCC's window).
      n_steps: adam steps (static; the loop is a ``lax.scan``).
      lr: adam learning rate on the latent coefficients.
      reg_factor: weight of the displacement smoothness term — training's
        ``SubspaceLoss`` at its converged (minimum) factor by default.
      warp_taps_dtype: forwarded to the warp (bf16 selects the 1-gather
        serving path; None = f32-exact).
      mesh: forwarded to the warp for mesh-sharded batches — without it a
        sharded batch hits the per-element GSPMD broadcast pathology on
        every scan step (``resample.warp_image`` mesh docstring).
      fast_vjp: use the warp's no-re-gather custom VJP (the refine step
        differentiates the warp wrt phi every iteration; see
        ``resample._quad_sample_bwd``).
      early_stop_patience: stop once no sample improved its best total by
        more than ``early_stop_tol`` for this many consecutive steps
        (``lax.while_loop``; ``_build_refine`` docstring). None = fixed
        ``n_steps`` scan.

    Returns:
      ``refine(coefs0, pca, moving, target) -> dict`` with keys
      ``coefs`` (refined latents — the BEST iterate by objective, never
      worse than the amortized prediction), ``phi``, ``warped``,
      ``sim_history`` and ``total_history`` ((n_steps+1,) — entry 0 is
      the unrefined loss, the last entry is the returned iterate's loss;
      ``history[-1] <= history[0]`` by construction).
      ``moving``/``target`` must be the pair the similarity was trained on
      (lung-masked when the model used ``mask_ct=True``).
    """
    img_sz = tuple(int(s) for s in img_sz)
    sim_fn = get_similarity(sim)
    if sim_opts:
        sim_fn = functools.partial(sim_fn, **dict(sim_opts))
    tx = optax.adam(lr)

    def _forward(coefs, pca, moving):
        disp = expand_pca(coefs, pca["vectors"], pca["mean"], img_sz)
        phi = disp + identity_map(img_sz)[None]
        warped = resample.warp_image(moving, phi, zero_boundary=True,
                                     scale_intensity=True,
                                     taps_dtype=warp_taps_dtype, mesh=mesh,
                                     fast_vjp=fast_vjp)
        return disp, phi, warped

    def _losses(coefs, pca, moving, target):
        disp, phi, warped = _forward(coefs, pca, moving)
        sim_loss = sim_fn(warped, target, reduction="none")       # (B,)
        total = sim_loss + reg_factor * displacement_reg(
            disp, reduction="none")
        return total, (sim_loss, phi, warped)

    return _build_refine(_losses, tx, n_steps,
                         early_stop_patience=early_stop_patience,
                         early_stop_tol=early_stop_tol)


#: similarities whose implementation is 3D-volume-only (NCDHW box-filter
#: convs) and therefore invalid on (B, P, pw, ph) projections
_VOLUME_ONLY_SIMS = ("lncc",)


def make_projection_refiner(img_sz, poses, resolution,
                            spacing=(2.2, 2.2, 2.2), sim="ncc",
                            sim_opts=None, n_steps=30, lr=0.05,
                            reg_factor=1e-3, proj_norm="drr",
                            warp_taps_dtype=None, mesh=None,
                            fast_vjp=False, early_stop_patience=None,
                            early_stop_tol=1e-4):
    """Projection-domain refinement: no target CT needed at serving time.

    The deployment scenario for 2D/3D registration is CBCT-free treatment
    verification — at serving time only the measured 2D projections of the
    current anatomy exist (reference ``README.md:2-11``), not a target CT.
    This refiner optimizes the latent so the DRR of the warped ATTENUATION
    volume matches the measured projections: each step differentiates
    through the PCA expansion, the warp, and the MXU projector
    (``ops/drr.py``, differentiable per ``tests/test_drr_grad.py``).

    Args:
      img_sz: (D, W, H).
      poses: (P, 3) emitter poses (``drr.synthesize_poses`` or geometry
        CSV), static.
      resolution: (pw, ph) detector resolution.
      spacing: voxel spacing (mm).
      sim / sim_opts / n_steps / lr / reg_factor: as :func:`make_refiner`.
      proj_norm: normalization applied to the simulated projections before
        the similarity — must match how the target projections were
        produced. ``"drr"``: clip [0,6] -> [-1,1] (the dataset's /
        pipeline's convention, ``Registration2D3DDataset.py:95-96``);
        ``"minmax"``: per-batch min-max -> [-1,1] (RegNet re-projection
        convention, ``RegNet2D3D.py:170``); ``None``: raw line integrals.

    Returns:
      ``refine(coefs0, pca, moving_atten, target_proj) -> dict`` (same
      keys as :func:`make_refiner`). ``moving_atten``: (B, 1, D, W, H)
      linear attenuation of the moving CT
      (``drr.calc_relative_atten_coef``); ``target_proj``: (B, P, pw, ph)
      normalized per ``proj_norm``. The returned ``warped`` is the warped
      attenuation volume.
    """
    if sim in _VOLUME_ONLY_SIMS:
        raise ValueError(
            f"similarity {sim!r} is 3D-volume-only (NCDHW box-filter "
            f"convolutions) and cannot score (B, P, pw, ph) projections — "
            f"use a 2D-capable similarity for projection-domain "
            f"refinement (e.g. 'ncc', 'ngf')")
    img_sz = tuple(int(s) for s in img_sz)
    resolution = tuple(int(r) for r in resolution)
    spacing = tuple(float(s) for s in spacing)
    sim_fn = get_similarity(sim)
    if sim_opts:
        sim_fn = functools.partial(sim_fn, **dict(sim_opts))
    tx = optax.adam(lr)

    def _normalize(p):
        if proj_norm == "drr":
            return drr.normalize_drr(p)
        if proj_norm == "minmax":
            lo, hi = jnp.min(p), jnp.max(p)
            return (p - lo) / (hi - lo) * 2.0 - 1.0
        return p

    def _forward(coefs, pca, moving_atten):
        disp = expand_pca(coefs, pca["vectors"], pca["mean"], img_sz)
        phi = disp + identity_map(img_sz)[None]
        # attenuation is nonnegative physical density — no [-1,1]
        # intensity shift around the warp. mesh/taps match make_refiner:
        # a sharded batch must keep the shard_map through every scan step.
        warped = resample.warp_image(moving_atten, phi, zero_boundary=True,
                                     scale_intensity=False,
                                     taps_dtype=warp_taps_dtype, mesh=mesh,
                                     fast_vjp=fast_vjp)
        proj = drr.project(warped[:, 0], poses, resolution, spacing)
        return disp, phi, warped, _normalize(proj)

    def _losses(coefs, pca, moving_atten, target_proj):
        disp, phi, warped, proj = _forward(coefs, pca, moving_atten)
        sim_loss = sim_fn(proj, target_proj, reduction="none")    # (B,)
        total = sim_loss + reg_factor * displacement_reg(
            disp, reduction="none")
        return total, (sim_loss, phi, warped)

    return _build_refine(_losses, tx, n_steps,
                         early_stop_patience=early_stop_patience,
                         early_stop_tol=early_stop_tol)
