"""Central finite differences.

Native replacement for the reference's external dependency
``mermaid.finite_differences.FD_torch`` / ``FD_np`` (used by
``losses/SubspaceLoss.py:51-67`` and ``utils/utils.py:20-55``): central
differences with replicate (zero-Neumann) boundary handling —
``d f/dx [i] = (f[i+1] - f[i-1]) / (2h)`` with ``f[-1]:=f[0]`` and
``f[N]:=f[N-1]``, so boundary derivatives are one-sided halves.

The reference always calls these with spacing ``2/(N-1)`` (displacements
live on the [-1, 1] normalized grid; ``SubspaceLoss.py:53-54``,
``utils/utils.py:31-32``).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _central(x, axis, h, xp):
    n = x.shape[axis]
    fwd = xp.take(x, xp.clip(xp.arange(1, n + 1), 0, n - 1), axis=axis)
    bwd = xp.take(x, xp.clip(xp.arange(-1, n - 1), 0, n - 1), axis=axis)
    return (fwd - bwd) * (0.5 / h)


def dXc(f, h, axis=-3):
    """Central difference along the first spatial axis of (..., D, W, H)."""
    return _central(f, axis, h, jnp)


def dYc(f, h, axis=-2):
    return _central(f, axis, h, jnp)


def dZc(f, h, axis=-1):
    return _central(f, axis, h, jnp)


def grad_norm_sq(disp, spacing):
    """``sum_c sum_d |d disp_c / d x_d|^2`` pointwise, the regularizer core
    of ``SubspaceLoss.compute_reg_loss`` (``losses/SubspaceLoss.py:51-67``).

    disp: ``(B, 3, D, W, H)``; spacing: length-3 (already including the
    factor-2 convention the reference applies).
    """
    hx, hy, hz = [float(s) for s in spacing]
    total = 0.0
    for c in range(disp.shape[1]):
        f = disp[:, c]
        total = total + _central(f, -3, hx, jnp) ** 2 \
                      + _central(f, -2, hy, jnp) ** 2 \
                      + _central(f, -1, hz, jnp) ** 2
    return total


def jacobian_determinant(phi, spacing):
    """Jacobian determinant of a map ``(B, 3, D, W, H)`` by central
    differences (``utils/utils.py:20-43``)."""
    hx, hy, hz = [float(s) for s in spacing]
    a = _central(phi[:, 0], -3, hx, jnp); b = _central(phi[:, 0], -2, hy, jnp)
    c = _central(phi[:, 0], -1, hz, jnp)
    d = _central(phi[:, 1], -3, hx, jnp); e = _central(phi[:, 1], -2, hy, jnp)
    f = _central(phi[:, 1], -1, hz, jnp)
    g = _central(phi[:, 2], -3, hx, jnp); h = _central(phi[:, 2], -2, hy, jnp)
    i = _central(phi[:, 2], -1, hz, jnp)
    return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)


def compute_jacobi_map(phi, spacing, crop_boundary=True, use_01=False):
    """Folding metric: (sum of |negative jacobian det|, count of negatives),
    averaged over batch — semantics of ``utils/utils.py:20-55`` including its
    quirk that the crop-boundary branch computes cropped values and then
    **overwrites them with the uncropped ones** (``:45-51``); we replicate the
    effective (uncropped) behavior and keep the flag for API parity.

    phi: numpy or jax array ``(B, 3, D, W, H)``; spacing: per-axis, scaled
    by 2 internally unless ``use_01``.
    """
    phi = np.asarray(phi)
    span = 1.0 if use_01 else 2.0
    sp = np.asarray(spacing, dtype=np.float64) * span
    det = np.asarray(jacobian_determinant(jnp.asarray(phi, jnp.float32), sp))
    neg = det[det < 0.0]
    jacobi_abs = -float(np.sum(neg))
    jacobi_num = float(np.sum(det < 0.0))
    return jacobi_abs / phi.shape[0], jacobi_num / phi.shape[0]
