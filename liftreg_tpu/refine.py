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
from .ops import resample


def make_refiner(img_sz, sim="ncc", sim_opts=None, n_steps=30, lr=0.05,
                 reg_factor=1e-3, warp_taps_dtype=None, mesh=None):
    """Build a jitted refinement function for one volume geometry.

    Args:
      img_sz: (D, W, H) of the volumes.
      sim: similarity key (``losses.similarity.get_similarity``) — use the
        one the model was trained with.
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

    Returns:
      ``refine(coefs0, pca, moving, target) -> dict`` with keys
      ``coefs`` (refined latents), ``phi``, ``warped``, ``sim_history``
      and ``total_history`` ((n_steps+1,) — entry 0 is the unrefined
      loss, so ``history[-1] < history[0]`` measures the gain).
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
                                     taps_dtype=warp_taps_dtype, mesh=mesh)
        return disp, phi, warped

    def _losses(coefs, pca, moving, target):
        disp, phi, warped = _forward(coefs, pca, moving)
        sim_loss = sim_fn(warped, target)
        total = sim_loss + reg_factor * displacement_reg(disp)
        return total, (sim_loss, phi, warped)

    @jax.jit
    def refine(coefs0, pca, moving, target):
        grad_fn = jax.value_and_grad(
            lambda z: _losses(z, pca, moving, target), has_aux=True)

        def step(carry, _):
            z, opt_state = carry
            (total, (sim_loss, _, _)), g = grad_fn(z)
            updates, opt_state = tx.update(g, opt_state, z)
            z = optax.apply_updates(z, updates)
            return (z, opt_state), (total, sim_loss)

        coefs0 = coefs0.astype(jnp.float32)
        (z, _), (totals, sims) = jax.lax.scan(
            step, (coefs0, tx.init(coefs0)), None, length=n_steps)
        # the scan's step-i losses are evaluated BEFORE update i, so the
        # history starts at the unrefined objective; one final evaluation
        # appends the refined loss and yields phi/warped (single forward)
        final_total, (final_sim, phi, warped) = _losses(z, pca, moving,
                                                        target)
        return {
            "coefs": z,
            "phi": phi,
            "warped": warped,
            "total_history": jnp.concatenate([totals, final_total[None]]),
            "sim_history": jnp.concatenate([sims, final_sim[None]]),
        }

    return refine
