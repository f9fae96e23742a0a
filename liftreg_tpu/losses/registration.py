"""Training losses (similarity + displacement regularization).

Functional equivalents of ``src/liftreg/losses/``:
* :class:`SubspaceLoss` — ``SubspaceLoss.py:9-67``: ``sim(warped, target)
  + reg_factor(epoch) * mean ||grad disp||^2`` with central differences at
  spacing ``2/(N-1)`` and a sigmoid-decayed regularization factor.
* :class:`Subspace2DLoss` — ``Subspace2DLoss.py:20-38``: similarity on the
  projections instead of the volumes.
* :class:`RegNet2D3DLoss` — ``RegNet2D3DLoss.py:20-68``: bidirectional
  projection similarity + regularization on forward and inverse fields
  (with its per-sample mean/sum reduction, ``:67``).

The epoch-dependent factor is computed host-side (a python float) and
passed into the jitted loss as a scalar operand, so no retracing occurs.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Callable

import jax.numpy as jnp
import numpy as np

from ..ops import fd
from .similarity import get_similarity


def sigmoid_decay(ep, static=5, k=5):
    """k/(k + exp(ep/k)) after ``static`` epochs (``utils/utils.py:93-107``)."""
    if ep < static:
        return 1.0
    return float(k / (k + np.exp((ep - static) / k)))


def displacement_reg(disp, reduction="mean", weights=None):
    """mean (or per-sample-mean-then-sum) of ``||grad disp||^2`` with
    spacing ``2/(N-1)`` (``SubspaceLoss.py:51-67``). ``weights`` (B,)
    zero out pad rows (``mesh.pad_batch``) in either reduction.
    ``reduction="none"`` returns the per-sample vector (refine.py's
    per-case best-iterate selection)."""
    sp = 2.0 / (np.array(disp.shape[2:]) - 1.0)
    l2 = fd.grad_norm_sq(disp, sp)
    per_sample = jnp.mean(l2.reshape(l2.shape[0], -1), axis=1)
    if reduction == "none":
        return per_sample
    if weights is None:
        if reduction == "mean":
            return jnp.mean(l2)
        return jnp.sum(per_sample)
    w = weights.astype(per_sample.dtype)
    if reduction == "mean":
        return jnp.sum(per_sample * w) / jnp.maximum(jnp.sum(w), 1.0)
    return jnp.sum(per_sample * w)


@dataclasses.dataclass
class RegFactorSchedule:
    """sigmoid-decayed regularization factor (``SubspaceLoss.py:40-49``)."""
    initial: float = 10.0
    minimum: float = 1e-3
    decay_from: int = 10
    decay_factor: float = 2.0

    def __call__(self, epoch):
        return float(max(
            sigmoid_decay(epoch, static=self.decay_from, k=self.decay_factor)
            * self.initial, self.minimum))


class SubspaceLoss:
    """``total = sim(warped, target) + reg_factor(epoch) * reg(params)``."""

    sim_key = "warped"
    target_key = "target"

    def __init__(self, opt=None):
        opt = opt or {}
        self.sim = get_similarity(opt.get("sim_class", "ncc"))
        # optional kwargs forwarded to the similarity fn (e.g. lncc's
        # ``win`` / ``smooth``); absent -> exact reference behavior
        sim_opts = dict(opt.get("sim_opts", {}) or {})
        if sim_opts:
            self.sim = functools.partial(self.sim, **sim_opts)
        self.reg_factor = RegFactorSchedule(
            initial=float(opt.get("initial_reg_factor", 10)),
            minimum=float(opt.get("min_reg_factor", 1e-3)),
            decay_from=int(opt.get("reg_factor_decay_from", 10)))

    def __call__(self, output, reg_factor, weights=None):
        """``reg_factor``: scalar from :meth:`factor` (host-computed).
        ``weights``: optional (B,) validity mask — pad rows added for mesh
        divisibility (``mesh.pad_batch``) get weight 0 so the repeated final
        sample carries no extra gradient."""
        sim_loss = self.sim(output[self.sim_key], output[self.target_key],
                            weights=weights)
        reg_loss = displacement_reg(output["params"], weights=weights)
        total = sim_loss + reg_factor * reg_loss
        return {"total_loss": total, "sim_loss": sim_loss,
                "reg_loss": reg_loss}

    def factor(self, epoch):
        return self.reg_factor(epoch)


class Subspace2DLoss(SubspaceLoss):
    """Similarity on projections (``Subspace2DLoss.py:22-23``)."""
    sim_key = "warped_proj"
    target_key = "target_proj"


class RegNet2D3DLoss(SubspaceLoss):
    """Bidirectional projection similarity + reg on both fields
    (``RegNet2D3DLoss.py:31-32,67``)."""

    def __call__(self, output, reg_factor, weights=None):
        sim_loss = (self.sim(output["warped_proj"], output["target_proj"],
                             weights=weights)
                    + self.sim(output["source_proj"],
                               output["warped_proj_inv"], weights=weights))
        disp, disp_inv = output["params"]
        reg_loss = (displacement_reg(disp, reduction="sum_of_means",
                                     weights=weights)
                    + displacement_reg(disp_inv, reduction="sum_of_means",
                                       weights=weights))
        total = sim_loss + reg_factor * reg_loss
        return {"total_loss": total, "sim_loss": sim_loss,
                "reg_loss": reg_loss}


class RegNetImageLoss(SubspaceLoss):
    """CT–CT image-domain similarity for the dense (basis-building) stage.

    The reference trains RegNet2D3D with bidirectional *projection*
    similarity (``RegNet2D3DLoss.py:31-32``) — there it is a 2D/3D
    registration model in its own right. For constructing the PCA
    deformation subspace the paper's premise is the opposite
    (``/root/reference/README.md:10-11``): training pairs are simulated,
    so the target CT is available and the dense registrations feeding the
    basis can be driven by a high-quality CT–CT similarity. ``total =
    sim(warped, target) + reg_factor * reg(forward disp)``. The inverse
    fixed-point scan and all three reprojections are unread and fall out
    of the traced program (XLA DCE), so the stage-1 step is also cheaper
    than under the projection loss.
    """

    def __call__(self, output, reg_factor, weights=None):
        sim_loss = self.sim(output["warped"], output["target"],
                            weights=weights)
        reg_loss = displacement_reg(output["params"][0], weights=weights)
        total = sim_loss + reg_factor * reg_loss
        return {"total_loss": total, "sim_loss": sim_loss,
                "reg_loss": reg_loss}


LOSS_REGISTRY = {
    "subspace": SubspaceLoss,
    "subspace2d": Subspace2DLoss,
    "regnet2d3d": RegNet2D3DLoss,
    "regnet_image": RegNetImageLoss,
    # reference class-path aliases (``cur_task_setting.json:53``)
    "liftreg.losses.SubspaceLoss.loss": SubspaceLoss,
    "liftreg.losses.Subspace2DLoss.loss": Subspace2DLoss,
    "liftreg.losses.RegNet2D3DLoss.loss": RegNet2D3DLoss,
}


def get_loss(name):
    if name in LOSS_REGISTRY:
        return LOSS_REGISTRY[name]
    raise KeyError(f"unknown loss '{name}'; known: {sorted(LOSS_REGISTRY)}")
