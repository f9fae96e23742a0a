"""Similarity measures.

Functional JAX ports of the reference's similarity losses:
* :func:`ncc_loss` — ``layers/losses.py:14-29`` (the configured ``sim_class``,
  ``cur_task_setting.json:51``).
* :func:`ncc_sqr_loss` — squared-NCC variant, ``layers/layers.py:238-255``.
* :func:`ngf_loss` — 2D normalized gradient fields, ``layers/losses.py:31-58``.
* :func:`gradient_loss` — Sobel-like 3D gradient MSE, ``layers/layers.py:258-287``.
* :func:`lncc_loss` — local (windowed) NCC; not in the reference repo but part
  of the target training configuration (driver north star); standard
  VoxelMorph-style implementation via box-filter sums, TPU-friendly as
  separable 1D convolutions.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _batch_mean(per_sample, weights):
    """Mean over the batch axis; with ``weights`` (B,) a weighted mean so
    zero-weight pad rows (mesh-divisibility padding, ``mesh.pad_batch``)
    contribute nothing to the loss or its gradient."""
    if weights is None:
        return jnp.mean(per_sample)
    w = weights.astype(per_sample.dtype)
    return jnp.sum(per_sample * w) / jnp.maximum(jnp.sum(w), 1.0)


def _reduce(per_sample_cc, weights, reduction):
    """``reduction="mean"``: scalar ``1 - batch_mean(cc)`` (the training
    contract, unchanged). ``"none"``: per-sample loss vector ``1 - cc_i``
    (its mean equals the scalar; used by per-case selection in refine.py).
    """
    if reduction == "none":
        return 1.0 - per_sample_cc
    return 1.0 - _batch_mean(per_sample_cc, weights)


def ncc_loss(pred, target, weights=None, reduction="mean"):
    """1 - mean_batch NCC. Matches ``layers/losses.py:14-29`` including its
    ``+1e-10`` on the centered values."""
    b = pred.shape[0]
    x = pred.reshape(b, -1)
    y = target.reshape(b, -1)
    xm = x - jnp.mean(x, axis=1, keepdims=True) + 1e-10
    ym = y - jnp.mean(y, axis=1, keepdims=True) + 1e-10
    ncc = jnp.mean(xm * ym, axis=1) / jnp.sqrt(
        jnp.mean(xm ** 2, axis=1) * jnp.mean(ym ** 2, axis=1))
    return _reduce(ncc, weights, reduction)


def ncc_sqr_loss(pred, target, weights=None, reduction="mean"):
    """Squared-NCC variant of ``layers/layers.py:238-255``: per-channel
    squared correlation, channel-mean, batch-sum, ``1 - sum/B``."""
    b, c = pred.shape[0], pred.shape[1]
    x = pred.reshape(b, c, -1)
    y = target.reshape(b, c, -1)
    xm = x - jnp.mean(x, axis=2, keepdims=True)
    ym = y - jnp.mean(y, axis=2, keepdims=True)
    ncc_sqr = (jnp.mean(xm * ym, axis=2) ** 2) / (
        jnp.mean(xm ** 2, axis=2) * jnp.mean(ym ** 2, axis=2) + 1e-12)
    return _reduce(jnp.mean(ncc_sqr, axis=1), weights, reduction)


def _ngf_gradient(x, eps):
    """Normalized 2D gradient with the reference's linear boundary condition
    (``layers/losses.py:43-58``). x: (B, C, H, W)."""
    gx = jnp.pad(x[:, :, 2:, :] - x[:, :, :-2, :], ((0, 0), (0, 0), (1, 1), (0, 0)))
    gy = jnp.pad(x[:, :, :, 2:] - x[:, :, :, :-2], ((0, 0), (0, 0), (0, 0), (1, 1)))
    gx = gx.at[:, :, 0, :].set(x[:, :, 1, :] - x[:, :, 0, :])
    gx = gx.at[:, :, -1, :].set(x[:, :, -1, :] - x[:, :, -2, :])
    gy = gy.at[:, :, :, 0].set(x[:, :, :, 1] - x[:, :, :, 0])
    gy = gy.at[:, :, :, -1].set(x[:, :, :, -1] - x[:, :, :, -2])
    g = jnp.stack([gx, gy], axis=-1)
    return g / jnp.sqrt(jnp.sum(g ** 2, axis=-1, keepdims=True) + eps)


def ngf_loss(i0, i1, eps=1e-10, weights=None, reduction="mean"):
    """Normalized-gradient-field loss for 2D images (``layers/losses.py:31-58``)."""
    g0 = _ngf_gradient(i0, eps)
    g1 = _ngf_gradient(i1, eps)
    dot = jnp.sum(g0 * g1, axis=-1)
    per_sample = jnp.mean(dot.reshape(dot.shape[0], -1) ** 2, axis=1)
    return _reduce(per_sample, weights, reduction)


_SOBEL_BASE = jnp.asarray([[1.0, 2.0, 1.0], [2.0, 4.0, 2.0], [1.0, 2.0, 1.0]])


def _sobel3d(x, axis):
    """3D Sobel-like gradient (filter of ``layers/layers.py:258-275``),
    'same' zero padding. x: (B, 1, D, W, H)."""
    fil = jnp.zeros((3, 3, 3))
    if axis == 0:
        fil = fil.at[0].set(_SOBEL_BASE).at[2].set(-_SOBEL_BASE)
    elif axis == 1:
        fil = fil.at[:, 0].set(_SOBEL_BASE).at[:, 2].set(-_SOBEL_BASE)
    else:
        fil = fil.at[:, :, 0].set(_SOBEL_BASE).at[:, :, 2].set(-_SOBEL_BASE)
    kernel = fil[None, None]  # (O=1, I=1, 3, 3, 3)
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1, 1), padding="SAME",
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"))


def gradient_loss(x, y):
    """MSE between Sobel gradients of x and y (``layers/layers.py:278-287``)."""
    total = 0.0
    for axis in range(3):
        total = total + jnp.mean((_sobel3d(x, axis) - _sobel3d(y, axis)) ** 2)
    return total


def _box_sum(x, win):
    """Separable box-filter sum over the spatial dims of (B, C, D, W, H).

    ``precision=HIGHEST`` is load-bearing: XLA truncates f32 conv inputs to
    bf16 by default, and the downstream variance terms are ~3-decimal-digit
    cancellations (``si2 - si^2/n`` over ``win^3`` voxels) — with truncated
    sums they come out with O(0.3) error and go negative, which made
    ``cc = cross^2/(var_i*var_j + eps)`` explode past 1 and diverge LNCC
    training on TPU (round 3; CPU tests never see it because CPU convs stay
    f32)."""
    for axis in (2, 3, 4):
        kshape = [1, 1, 1]
        kshape[axis - 2] = win
        kernel = jnp.ones((1, 1, *kshape), dtype=x.dtype)
        x = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1, 1, 1), padding="SAME",
            dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
            precision=jax.lax.Precision.HIGHEST)
    return x


def _smooth_triangle(x, k):
    """Normalized separable triangle pre-filter (two ``k``-box passes with
    exact per-voxel weights, so constants — including boundary voxels — are
    preserved). x: (B, C, D, W, H).

    ``k`` must be an odd int >= 1: XLA's SAME padding and numpy's
    'same' convolution center even kernels differently, so an even ``k``
    would mis-normalize by up to two orders of magnitude."""
    import numpy as np
    if k != int(k) or int(k) < 1 or int(k) % 2 == 0:
        raise ValueError(f"smooth must be an odd integer >= 1, got {k!r}")
    k = int(k)
    num = _box_sum(_box_sum(x, k), k)
    den = 1.0
    for axis in (2, 3, 4):
        n = x.shape[axis]
        t = np.convolve(np.convolve(np.ones(n), np.ones(k), "same"),
                        np.ones(k), "same")
        shape = [1] * 5
        shape[axis] = n
        den = den * jnp.asarray(t.reshape(shape), dtype=x.dtype)
    return num / den


def _avg_pool3(x, k):
    """k^3 average pool with stride k over (B, C, D, W, H)."""
    import jax.lax as lax
    return lax.reduce_window(x, 0.0, lax.add,
                             (1, 1, k, k, k), (1, 1, k, k, k),
                             "VALID") / float(k ** 3)


def lncc_loss(pred, target, win=9, eps=1e-5, weights=None, smooth=0,
              scales=None, reduction="mean"):
    """Local NCC over ``win``-cubed windows, 1 - mean(cc^2).

    ``scales``: optional pyramid, e.g. ``[1, 2, 4]`` — the loss becomes
    the mean of the windowed LNCC computed at each average-pooled
    downsampling factor. A win-9 window at full resolution cannot rank
    displacements beyond ~4 voxels (the 160^3 capture-radius failure
    measured in DEMO.md "LNCC on the vascular set"); pooling by s makes
    the same window span s x the physical extent, giving coarse scales
    the long-range signal and fine scales the precision — the classic
    coarse-to-fine similarity, fused in one program (avg-pools + box
    filters, all XLA-fusable). ``None``/``[1]`` is exact single-scale
    reference behavior.

    ``smooth``: optional pre-filter applied to BOTH images before the
    windowed correlation — an odd box width ``k`` used twice (triangle
    support ``2k-1`` voxels); 0 disables. Windowed CC of a band-limited
    texture has a coherent sub-voxel pathology at 160^3: near the
    grid-aligned identity every trilinear sample de-sharpens in phase, so
    the exact gradient points back toward zero displacement even though the
    coarse landscape decreases toward alignment (measured: dL/dalpha = +27
    at alpha=0.005 along the ground-truth direction, while
    L(0.1) < L(0)). A scale-space pre-smooth (k=3 suffices) removes the
    blur-cycle term and the same directional derivative becomes uniformly
    negative. See DESIGN.md "LNCC at production scale"."""
    if scales is not None and list(scales) != [1]:
        per_scale = []
        for s in scales:
            s = int(s)
            p = pred if s == 1 else _avg_pool3(pred, s)
            t = target if s == 1 else _avg_pool3(target, s)
            per_scale.append(lncc_loss(p, t, win=win, eps=eps, smooth=smooth,
                                       reduction="none"))
        # per_scale entries are per-sample LOSSES (1 - cc) already —
        # average them directly, do not pass back through _reduce's 1-x
        per_sample_loss = jnp.mean(jnp.stack(per_scale), axis=0)
        if reduction == "none":
            return per_sample_loss
        return _batch_mean(per_sample_loss, weights)
    if smooth:
        # pass through unconverted so _smooth_triangle's odd-int check
        # rejects fractional widths (int() here would silently accept
        # e.g. 1.5 as the identity filter)
        pred = _smooth_triangle(pred, smooth)
        target = _smooth_triangle(target, smooth)
    i, j = pred, target
    i2, j2, ij = i * i, j * j, i * j
    n = float(win ** 3)
    si, sj = _box_sum(i, win), _box_sum(j, win)
    si2, sj2, sij = _box_sum(i2, win), _box_sum(j2, win), _box_sum(ij, win)
    mu_i, mu_j = si / n, sj / n
    cross = sij - mu_j * si - mu_i * sj + mu_i * mu_j * n
    # clamp the residual f32 cancellation noise: true variances are >= 0,
    # and cc must stay <= 1 even where a window is near-constant
    var_i = jnp.maximum(si2 - 2 * mu_i * si + mu_i * mu_i * n, 0.0)
    var_j = jnp.maximum(sj2 - 2 * mu_j * sj + mu_j * mu_j * n, 0.0)
    cc = (cross * cross) / (var_i * var_j + eps)
    per_sample = jnp.mean(cc.reshape(cc.shape[0], -1), axis=1)
    return _reduce(per_sample, weights, reduction)


SIMILARITY_REGISTRY = {
    "ncc": ncc_loss,
    "ncc_sqr": ncc_sqr_loss,
    "ngf": ngf_loss,
    "lncc": lncc_loss,
    # reference class-path aliases (``cur_task_setting.json:51``)
    "liftreg.layers.losses.NCCLoss": ncc_loss,
    "layers.losses.NCCLoss": ncc_loss,
    "liftreg.layers.layers.NCCLoss": ncc_sqr_loss,
    "liftreg.layers.losses.NGFLoss": ngf_loss,
}


def get_similarity(name):
    if name in SIMILARITY_REGISTRY:
        return SIMILARITY_REGISTRY[name]
    raise KeyError(f"unknown similarity '{name}'; known: "
                   f"{sorted(SIMILARITY_REGISTRY)}")
