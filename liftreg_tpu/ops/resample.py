"""Differentiable image resampling (the spatial-transformer core).

TPU-native replacement for the reference's ``torch.nn.functional.grid_sample``
uses (``net_utils.py:26-38``, ``sdct_projection_utils.py:81,89-93``). The
semantics reproduced exactly are torch's ``align_corners=True`` with
``zeros`` / ``border`` padding in ``bilinear`` / ``nearest`` modes.

Implementation notes (TPU):
* The warp is a true data-dependent gather; gather cost on TPU is
  per-index, so the 3D bilinear path packs each z-corner's 2x2 (y, x)
  interpolation block into one gathered row (see
  :func:`_trilinear_quad`) — 2 gathers per warp. Static shapes throughout.
* ``warp_image`` follows the map convention of :mod:`liftreg_tpu.coords`:
  channel ``c`` of ``phi`` indexes spatial axis ``c`` — the reference's
  (x,y,z)->(z,y,x) channel flip (``net_utils.py:27-30``) is folded in.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _gather_nd(vol_flat, idx_flat):
    """vol_flat: (B, C, S); idx_flat: (B, M) int32 -> (B, C, M).

    Performance note (TPU): batch folds into the flat index so each channel
    is ONE 1-D ``jnp.take`` over a flat buffer — XLA's fast scalar-gather
    path. The batched ``take_along_axis`` formulation hits a pathological
    lowering (~20x slower at 160^3; measured 6.8s vs 0.34s for a full
    8-corner warp).
    """
    B, C, S = vol_flat.shape
    M = idx_flat.shape[-1]
    offsets = (jnp.arange(B, dtype=idx_flat.dtype) * S)[:, None]
    flat = (idx_flat + offsets).reshape(-1)          # (B*M,)
    outs = [jnp.take(vol_flat[:, c].reshape(-1), flat).reshape(B, M)
            for c in range(C)]
    return jnp.stack(outs, axis=1)                   # (B, C, M)


def _trilinear_quad(vol, coords, padding, fast_vjp=False):
    """Batch wrapper: per-index gather cost roughly DOUBLES once the gather
    operand exceeds a single volume (measured at 160^3: B=1 54.6 ms but a
    monolithic B=2 gather 211-228 ms, B=4 421 ms), so batches process one
    element at a time — bit-exact, and 2x faster from B=2 up (B=2 108 ms,
    B=4 215 ms). The loop unrolls at trace time (B is static)."""
    B = vol.shape[0]
    if B > 1:
        outs = [_trilinear_quad_one(vol[b:b + 1], coords[b:b + 1], padding,
                                    fast_vjp)
                for b in range(B)]
        return jnp.concatenate(outs, axis=0)
    return _trilinear_quad_one(vol, coords, padding, fast_vjp)


def _trilinear_quad_one(vol, coords, padding, fast_vjp=False):
    """Fast exact trilinear path: 2 row-gathers instead of 8 scalar gathers.

    Gather cost on TPU is per-*index* and nearly independent of row width
    (measured at 160^3: 57ms for a 4.1M-index gather whether rows are 1, 2
    or 4 f32 wide, bf16 no faster, sequential indices no faster) — so the
    lever is gather *count*. An overlapping-quads buffer
    ``Q[f] = (v[f], v[f+1], v[f+H], v[f+H+1])`` holds each z-plane's full
    2x2 (y, x) interpolation block, so one gather per z-corner suffices:
    2 gathers total (measured 87ms vs 110ms for the 4-gather pairs variant
    and 96ms for a 1-gather 8-wide variant; backward 619ms vs 850ms).

    The (y, x) starts are clamped to ``W-2``/``H-2`` and weights use the
    block-local coordinate ``t`` with ``relu(1 - |t - k|)``, which
    reproduces zeros-padding bilinear weights exactly (out-of-range taps
    vanish); border mode clamps the pixel coordinate beforehand. In-plane
    offsets never cross a (batch, channel, z)-slice boundary because the
    starts are clamped, so one shared quad buffer serves all channels.

    With ``fast_vjp`` differentiation goes through :func:`_quad_sample`'s
    custom VJP — the backward REUSES the forward's gathered rows as
    residuals instead of re-gathering (the gather is the whole cost of
    this op; see ``_quad_sample_bwd``). Default off: the custom-VJP call
    changes the traced StableHLO even in primal-only programs, which
    would invalidate the committed compile cache the driver bench relies
    on (tools/check_cache_trace.py) — callers that differentiate the warp
    opt in explicitly.
    """
    if fast_vjp:
        return _quad_sample(padding, vol, coords)
    return _quad_plain(vol, coords, padding)


def _quad_plain(vol, coords, padding):
    """The ORIGINAL quad body, byte-for-byte: the default (plain-AD) path
    must trace the exact op sequence the committed compile cache was
    warmed with (tools/check_cache_trace.py) — even a reordering of the
    same arithmetic changes the StableHLO hash. The fast_vjp path uses
    the restructured :func:`_quad_impl`."""
    B, C = vol.shape[:2]
    D, W, H = vol.shape[2:]
    S = D * W * H
    out_shape = coords.shape[1:-1]
    compute_dtype = vol.dtype if jnp.issubdtype(vol.dtype, jnp.floating) \
        else jnp.float32
    c = coords.reshape(B, -1, 3).astype(compute_dtype)
    M = c.shape[1]
    if padding == "border":
        c = jnp.clip(c, 0.0, jnp.asarray([D - 1, W - 1, H - 1],
                                         dtype=compute_dtype))

    pz, py, px = c[..., 0], c[..., 1], c[..., 2]
    z0 = jnp.floor(pz).astype(jnp.int32)
    fz = pz - z0
    yc = jnp.clip(jnp.floor(py).astype(jnp.int32), 0, W - 2)
    xc = jnp.clip(jnp.floor(px).astype(jnp.int32), 0, H - 2)
    ty = py - yc
    tx = px - xc
    wy0 = jnp.maximum(0.0, 1.0 - jnp.abs(ty))
    wy1 = jnp.maximum(0.0, 1.0 - jnp.abs(ty - 1.0))
    wx0 = jnp.maximum(0.0, 1.0 - jnp.abs(tx))
    wx1 = jnp.maximum(0.0, 1.0 - jnp.abs(tx - 1.0))
    wyx = jnp.stack([wy0 * wx0, wy0 * wx1, wy1 * wx0, wy1 * wx1], axis=-1)

    v = vol.reshape(-1)

    def shift(k):
        return jnp.concatenate([v[k:], v[:k]]) if k else v

    quad = jnp.stack([v, shift(1), shift(H), shift(H + 1)], axis=1)  # (BCS,4)
    batch_off = (jnp.arange(B, dtype=jnp.int32) * (C * S))[:, None]

    out = jnp.zeros((B, C, M), dtype=compute_dtype)
    for dz in (0, 1):
        zj = z0 + dz
        w = fz if dz else 1.0 - fz
        if padding == "zeros":
            m = (zj >= 0) & (zj <= D - 1)
            w = w * m.astype(compute_dtype)
        base = jnp.clip(zj, 0, D - 1) * (W * H) + yc * H + xc  # (B, M)
        taps = []
        for ch in range(C):
            idx = (base + batch_off + ch * S).reshape(-1)
            taps.append(quad[idx].reshape(B, M, 4))           # (B, M, 4)
        rows_bc = jnp.stack(taps, axis=1)                     # (B, C, M, 4)
        val = jnp.sum(rows_bc * wyx[:, None, :, :], axis=-1)
        out = out + val * w[:, None, :]
    return out.reshape(B, C, *out_shape)


def _quad_geom(c, dims, padding, compute_dtype):
    """Elementwise index/weight math of the quad path, shared by the
    forward and the custom VJP so both differentiate the SAME expressions.

    c: (B, M, 3) pixel coordinates (already in ``compute_dtype``).
    Returns ``(z0, yc, xc, wyx, (w_dz0, w_dz1))`` — int starts, the (y,x)
    2x2 block weights (B, M, 4), and the two z-corner weights with the
    zeros-padding mask folded in.
    """
    D, W, H = dims
    if padding == "border":
        c = jnp.clip(c, 0.0, jnp.asarray([D - 1, W - 1, H - 1],
                                         dtype=compute_dtype))

    pz, py, px = c[..., 0], c[..., 1], c[..., 2]
    z0 = jnp.floor(pz).astype(jnp.int32)
    fz = pz - z0
    yc = jnp.clip(jnp.floor(py).astype(jnp.int32), 0, W - 2)
    xc = jnp.clip(jnp.floor(px).astype(jnp.int32), 0, H - 2)
    ty = py - yc
    tx = px - xc
    wy0 = jnp.maximum(0.0, 1.0 - jnp.abs(ty))
    wy1 = jnp.maximum(0.0, 1.0 - jnp.abs(ty - 1.0))
    wx0 = jnp.maximum(0.0, 1.0 - jnp.abs(tx))
    wx1 = jnp.maximum(0.0, 1.0 - jnp.abs(tx - 1.0))
    wyx = jnp.stack([wy0 * wx0, wy0 * wx1, wy1 * wx0, wy1 * wx1], axis=-1)

    wz = []
    for dz in (0, 1):
        zj = z0 + dz
        w = fz if dz else 1.0 - fz
        if padding == "zeros":
            m = (zj >= 0) & (zj <= D - 1)
            w = w * m.astype(compute_dtype)
        wz.append(w)
    return z0, yc, xc, wyx, tuple(wz)


def _quad_compute_dtype(vol):
    return vol.dtype if jnp.issubdtype(vol.dtype, jnp.floating) \
        else jnp.float32


def _quad_impl(padding, vol, coords):
    """The quad forward; also returns the gathered rows (VJP residuals)."""
    B, C = vol.shape[:2]
    D, W, H = vol.shape[2:]
    S = D * W * H
    out_shape = coords.shape[1:-1]
    compute_dtype = _quad_compute_dtype(vol)
    c = coords.reshape(B, -1, 3).astype(compute_dtype)
    M = c.shape[1]
    z0, yc, xc, wyx, wz = _quad_geom(c, (D, W, H), padding, compute_dtype)

    v = vol.reshape(-1)

    def shift(k):
        return jnp.concatenate([v[k:], v[:k]]) if k else v

    quad = jnp.stack([v, shift(1), shift(H), shift(H + 1)], axis=1)  # (BCS,4)
    batch_off = (jnp.arange(B, dtype=jnp.int32) * (C * S))[:, None]

    out = jnp.zeros((B, C, M), dtype=compute_dtype)
    rows_saved = []
    for dz in (0, 1):
        base = jnp.clip(z0 + dz, 0, D - 1) * (W * H) + yc * H + xc  # (B, M)
        taps = []
        for ch in range(C):
            idx = (base + batch_off + ch * S).reshape(-1)
            taps.append(quad[idx].reshape(B, M, 4))           # (B, M, 4)
        rows_bc = jnp.stack(taps, axis=1)                     # (B, C, M, 4)
        rows_saved.append(rows_bc)
        val = jnp.sum(rows_bc * wyx[:, None, :, :], axis=-1)
        out = out + val * wz[dz][:, None, :]
    return out.reshape(B, C, *out_shape), tuple(rows_saved)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _quad_sample(padding, vol, coords):
    return _quad_impl(padding, vol, coords)[0]


def _quad_sample_fwd(padding, vol, coords):
    out, rows = _quad_impl(padding, vol, coords)
    return out, (vol, coords, *rows)


def _quad_sample_bwd(padding, res, g):
    """Quad-warp backward WITHOUT re-gathering.

    Plain AD leaves XLA free to rematerialize the two row-gathers in the
    backward (a gather costs ~6.5 ns/index — the entire price of the op —
    while saving the rows costs one 66 MB HBM round-trip, ~0.3 ms at
    160^3). This VJP pins the fast choice: the gathered rows are
    residuals; the coordinate gradient is pure elementwise math through
    ``jax.vjp`` of :func:`_quad_geom` (identical gradient semantics to
    AD of the forward); the image gradient is 8 SCALAR scatter-adds,
    which beat AD's 4-wide row scatters ~7x per index (DESIGN.md §3a:
    11.6 vs 83 ns/idx) and are dead-code-eliminated entirely when the
    image is not differentiated (refinement, subspace training).
    """
    vol, coords, rows0, rows1 = res
    B, C = vol.shape[:2]
    D, W, H = vol.shape[2:]
    S = D * W * H
    compute_dtype = _quad_compute_dtype(vol)
    M = rows0.shape[2]
    g2 = g.reshape(B, C, M).astype(compute_dtype)
    c = coords.reshape(B, -1, 3).astype(compute_dtype)

    def geom_w(cf):
        _, _, _, wyx, wz = _quad_geom(cf, (D, W, H), padding, compute_dtype)
        return wyx, wz[0], wz[1]

    (wyx, wz0, wz1), vjp_c = jax.vjp(geom_w, c)

    # d/d(weights): out = sum_dz wz_dz * sum_k rows_dz[..., k] * wyx[..., k]
    val0 = jnp.sum(rows0 * wyx[:, None, :, :], axis=-1)       # (B, C, M)
    val1 = jnp.sum(rows1 * wyx[:, None, :, :], axis=-1)
    d_wz0 = jnp.sum(g2 * val0, axis=1)                        # (B, M)
    d_wz1 = jnp.sum(g2 * val1, axis=1)
    d_wyx = jnp.sum(
        g2[..., None] * (rows0 * wz0[:, None, :, None]
                         + rows1 * wz1[:, None, :, None]), axis=1)  # (B,M,4)
    (d_c,) = vjp_c((d_wyx, d_wz0, d_wz1))
    d_coords = d_c.reshape(coords.shape).astype(coords.dtype)

    # d/d(vol): scalar scatter-adds at the 8 corner positions. Computed
    # lazily in the graph — XLA removes all of it when the caller does not
    # differentiate wrt the image.
    z0, yc, xc, _, _ = _quad_geom(c, (D, W, H), padding, compute_dtype)
    bc_off = (jnp.arange(B * C, dtype=jnp.int32) * S).reshape(B, C, 1)
    d_vol = jnp.zeros((B * C * S,), compute_dtype)
    for dz, (rows, wzk) in ((0, (rows0, wz0)), (1, (rows1, wz1))):
        base = jnp.clip(z0 + dz, 0, D - 1) * (W * H) + yc * H + xc
        idx = base[:, None, :] + bc_off                       # (B, C, M)
        d_rows = g2[..., None] * (wzk[:, None, :, None]
                                  * wyx[:, None, :, :])       # (B, C, M, 4)
        for k, off in enumerate((0, 1, H, H + 1)):
            d_vol = d_vol.at[(idx + off).reshape(-1)].add(
                d_rows[..., k].reshape(-1))
    return d_vol.reshape(vol.shape).astype(vol.dtype), d_coords


_quad_sample.defvjp(_quad_sample_fwd, _quad_sample_bwd)


def _trilinear_oct_bf16(vol, coords, padding, fast_vjp=False):
    """Serving fast path: the ENTIRE 2x2x2 corner block as ONE gathered row.

    The gather law (DESIGN.md section 3): ~6.5 ns/index while the operand
    stays <= ~66 MB, ~15 ns/index beyond. An 8-wide bf16 buffer of a 160^3
    volume is exactly 66 MB, so one 4.1M-index gather covers all 8 taps in
    ~26 ms — half the exact quad path's 2 gathers. Taps are stored bf16
    (~4e-3 relative intensity error on the warped image; the map itself
    stays f32-exact), weights/accumulation are f32. Opt-in via
    ``grid_sample(..., taps_dtype=jnp.bfloat16)``.
    """
    B = vol.shape[0]
    out_shape = coords.shape[1:-1]
    if B > 1:
        outs = [_trilinear_oct_bf16(vol[b:b + 1], coords[b:b + 1], padding,
                                    fast_vjp)
                for b in range(B)]
        return jnp.concatenate(outs, axis=0)
    C = vol.shape[1]
    if fast_vjp:
        out = _oct_sample(padding, vol, coords)
        return out.reshape(1, C, *out_shape)
    return _oct_plain(vol, coords, padding)


def _oct_plain(vol, coords, padding):
    """The ORIGINAL oct body, byte-for-byte (same compile-cache rationale
    as :func:`_quad_plain`)."""
    B, C = vol.shape[:2]
    D, W, H = vol.shape[2:]
    S = D * W * H
    out_shape = coords.shape[1:-1]
    c = coords.reshape(1, -1, 3).astype(jnp.float32)
    M = c.shape[1]
    if padding == "border":
        c = jnp.clip(c, 0.0, jnp.asarray([D - 1, W - 1, H - 1],
                                         dtype=jnp.float32))
    starts, w01 = [], []
    for d, n in zip(range(3), (D, W, H)):
        cd = c[..., d]
        sd = jnp.clip(jnp.floor(cd).astype(jnp.int32), 0, n - 2)
        t = cd - sd
        starts.append(sd)
        w01.append((jnp.maximum(0.0, 1.0 - jnp.abs(t)),
                    jnp.maximum(0.0, 1.0 - jnp.abs(t - 1.0))))

    # flatten BEFORE the bf16 cast: casting the 5-D (B,1,D,W,H) array puts
    # the singleton channel in the minor (lane) dim and XLA materializes a
    # 128x-padded copy (7.8 GB at B=8)
    v = vol.reshape(-1).astype(jnp.bfloat16)

    def shift(k):
        return jnp.concatenate([v[k:], v[:k]]) if k else v

    octs = jnp.stack([shift(dz * W * H + dy * H + dx)
                      for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)],
                     axis=1)                                # (C*S, 8)
    base = starts[0] * (W * H) + starts[1] * H + starts[2]  # (1, M)
    out = jnp.zeros((1, C, M), dtype=jnp.float32)
    wz, wy, wx = w01
    weights = [wz[dz] * wy[dy] * wx[dx]
               for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)]
    for ch in range(C):
        rows = octs[(base + ch * S).reshape(-1)].astype(jnp.float32)  # (M, 8)
        val = sum(rows[:, k] * weights[k].reshape(-1) for k in range(8))
        out = out.at[:, ch, :].set(val[None])
    return out.reshape(1, C, *out_shape)


def _oct_geom(c, dims, padding):
    """Elementwise index/weight math of the oct path (shared fwd/VJP).

    c: (1, M, 3) f32 pixel coordinates. Returns ``(starts, weights)`` —
    per-axis int starts and the 8 corner weights in (dz, dy, dx) order.
    """
    D, W, H = dims
    if padding == "border":
        c = jnp.clip(c, 0.0, jnp.asarray([D - 1, W - 1, H - 1],
                                         dtype=jnp.float32))
    starts, w01 = [], []
    for d, n in zip(range(3), (D, W, H)):
        cd = c[..., d]
        sd = jnp.clip(jnp.floor(cd).astype(jnp.int32), 0, n - 2)
        t = cd - sd
        starts.append(sd)
        w01.append((jnp.maximum(0.0, 1.0 - jnp.abs(t)),
                    jnp.maximum(0.0, 1.0 - jnp.abs(t - 1.0))))
    wz, wy, wx = w01
    weights = [wz[dz] * wy[dy] * wx[dx]
               for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)]
    return starts, weights


def _oct_impl(padding, vol, coords):
    """The oct forward; also returns the gathered bf16 rows (the custom
    VJP's residuals). Only the fast_vjp path traces this — the default
    path uses :func:`_oct_plain` to keep the primal-only StableHLO
    byte-identical to the pre-VJP program (compile-cache contract)."""
    C = vol.shape[1]
    D, W, H = vol.shape[2:]
    S = D * W * H
    c = coords.reshape(1, -1, 3).astype(jnp.float32)
    M = c.shape[1]
    starts, weights = _oct_geom(c, (D, W, H), padding)

    # flatten BEFORE the bf16 cast: casting the 5-D (B,1,D,W,H) array puts
    # the singleton channel in the minor (lane) dim and XLA materializes a
    # 128x-padded copy (7.8 GB at B=8)
    v = vol.reshape(-1).astype(jnp.bfloat16)

    def shift(k):
        return jnp.concatenate([v[k:], v[:k]]) if k else v

    octs = jnp.stack([shift(dz * W * H + dy * H + dx)
                      for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)],
                     axis=1)                                # (C*S, 8)
    base = starts[0] * (W * H) + starts[1] * H + starts[2]  # (1, M)
    out = jnp.zeros((1, C, M), dtype=jnp.float32)
    rows_saved = []
    for ch in range(C):
        rows = octs[(base + ch * S).reshape(-1)].astype(jnp.float32)  # (M, 8)
        rows_saved.append(rows.astype(jnp.bfloat16))
        val = sum(rows[:, k] * weights[k].reshape(-1) for k in range(8))
        out = out.at[:, ch, :].set(val[None])
    return out, jnp.stack(rows_saved)                       # (C, M, 8) bf16


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _oct_sample(padding, vol, coords):
    return _oct_impl(padding, vol, coords)[0]


def _oct_sample_fwd(padding, vol, coords):
    out, rows = _oct_impl(padding, vol, coords)
    return out, (vol, coords, rows)


def _oct_sample_bwd(padding, res, g):
    """Oct-warp backward without re-gathering (see ``_quad_sample_bwd`` —
    same rationale; the rows residual is bf16, one 66 MB round-trip at
    160^3 instead of a second ~26 ms 4.1M-index gather per step)."""
    vol, coords, rows = res
    C = vol.shape[1]
    D, W, H = vol.shape[2:]
    S = D * W * H
    M = rows.shape[1]
    g2 = g.reshape(1, C, M).astype(jnp.float32)
    c = coords.reshape(1, -1, 3).astype(jnp.float32)

    def geom_w(cf):
        _, weights = _oct_geom(cf, (D, W, H), padding)
        return jnp.stack(weights, axis=-1)                  # (1, M, 8)

    w8, vjp_c = jax.vjp(geom_w, c)
    rows_f = rows.astype(jnp.float32)                       # (C, M, 8)
    d_w8 = jnp.einsum("cm,cmk->mk", g2[0], rows_f)[None]    # (1, M, 8)
    (d_c,) = vjp_c(d_w8)
    d_coords = d_c.reshape(coords.shape).astype(coords.dtype)

    # image gradient: 8 scalar scatter-adds per channel (DCE'd when the
    # image is not differentiated — the serving/refinement case)
    starts, _ = _oct_geom(c, (D, W, H), padding)
    base = (starts[0] * (W * H) + starts[1] * H + starts[2])[0]  # (M,)
    d_w_rows = g2[0][:, :, None] * w8[0][None]              # (C, M, 8)
    d_vol = jnp.zeros((C * S,), jnp.float32)
    k = 0
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                off = dz * W * H + dy * H + dx
                for ch in range(C):
                    d_vol = d_vol.at[base + ch * S + off].add(
                        d_w_rows[ch, :, k])
                k += 1
    return d_vol.reshape(vol.shape).astype(vol.dtype), d_coords


_oct_sample.defvjp(_oct_sample_fwd, _oct_sample_bwd)


def grid_sample(vol, coords, mode="bilinear", padding="zeros",
                taps_dtype=None, fast_vjp=False, plane_window=None):
    """Sample ``vol`` at pixel-space ``coords`` (align_corners=True semantics).

    Args:
      vol: ``(B, C, *spatial)`` with 2 or 3 spatial dims.
      coords: ``(B, *out_shape, ndim)`` pixel coordinates; ``coords[..., d]``
        indexes spatial axis ``d`` of ``vol`` (NOT torch's reversed order —
        callers converting torch-style grids must flip the last axis).
      mode: ``bilinear`` (tri/bilinear) or ``nearest``.
      padding: ``zeros`` (out-of-range taps contribute 0, matching torch
        zeros+align_corners) or ``border`` (clamp).
      taps_dtype: ``jnp.bfloat16`` selects the 1-gather serving path for
        the 3D bilinear case (bf16 tap storage, f32 weights/accumulation —
        see :func:`_trilinear_oct_bf16`); None (default) is f32-exact.
      fast_vjp: route the 3D bilinear fast paths through their custom
        VJPs — the backward reuses the forward's gathered rows instead of
        re-gathering, and the image gradient uses scalar scatter-adds
        (see ``_quad_sample_bwd``). Off by default because the
        custom-VJP call changes the traced program even for primal-only
        use (compile-cache contract, tools/check_cache_trace.py); callers
        that differentiate through the warp should opt in.
      plane_window: optional ``(dy_max, dx_max)`` — route the 3D bilinear
        self-warp case (out grid == volume grid) through the Pallas
        locality kernel (``ops/pallas_warp.py``): the volume stays
        VMEM-resident, z displacement is unbounded, y/x displacement
        beyond the window degrades to clamped sampling. FORWARD-ONLY
        (serving); measure the field first with
        ``pallas_warp.displacement_window``.

    Returns:
      ``(B, C, *out_shape)``.
    """
    spatial = vol.shape[2:]
    ndim = len(spatial)
    assert coords.shape[-1] == ndim, (coords.shape, vol.shape)
    B, C = vol.shape[:2]
    out_shape = coords.shape[1:-1]
    if taps_dtype is not None:
        # canonicalize so the string form ("bfloat16", e.g. straight from a
        # JSON config) selects the same path as jnp.bfloat16
        taps_dtype = jnp.dtype(taps_dtype)

    if ndim == 3 and mode == "bilinear" and spatial[-1] >= 2 \
            and spatial[-2] >= 2:
        if plane_window is not None and out_shape == spatial:
            # differentiable wrt coords (the with_grad kernel variant
            # becomes the custom-VJP residual source); the image cotangent
            # is fail-loud NaN — see pallas_warp.warp_plane_sample
            from .pallas_warp import warp_plane_sample
            taps = "bfloat16" if taps_dtype == jnp.bfloat16 else "float32"
            return warp_plane_sample(
                padding, int(plane_window[0]), int(plane_window[1]),
                taps, "auto", vol, coords)
        if taps_dtype == jnp.bfloat16 and spatial[0] >= 2:
            return _trilinear_oct_bf16(vol, coords, padding, fast_vjp)
        return _trilinear_quad(vol, coords, padding, fast_vjp)

    vol_flat = vol.reshape(B, C, -1)
    coords_flat = coords.reshape(B, -1, ndim)
    compute_dtype = vol.dtype if jnp.issubdtype(vol.dtype, jnp.floating) else jnp.float32
    c = coords_flat.astype(compute_dtype)

    strides = []
    s = 1
    for n in reversed(spatial):
        strides.append(s)
        s *= n
    strides = strides[::-1]  # stride per spatial axis

    if mode == "nearest":
        # torch nearest with align_corners=True: round the pixel coordinate
        # half-up is what torch does via floor(x + 0.5)? torch uses
        # round-to-nearest (std::nearbyint semantics ~ round-half-to-even);
        # empirically floor(x+0.5) matches for the non-degenerate case and is
        # what we golden-test against torch (tests/test_resample.py).
        idx_axes = [jnp.floor(c[..., d] + 0.5).astype(jnp.int32) for d in range(ndim)]
        inb = jnp.ones(c.shape[:-1], dtype=bool)
        flat = jnp.zeros(c.shape[:-1], dtype=jnp.int32)
        for d, n in enumerate(spatial):
            inb &= (idx_axes[d] >= 0) & (idx_axes[d] <= n - 1)
            flat += jnp.clip(idx_axes[d], 0, n - 1) * strides[d]
        out = _gather_nd(vol_flat, flat)
        if padding == "zeros":
            out = out * inb[:, None, :].astype(out.dtype)
        return out.reshape(B, C, *out_shape)

    # bilinear / trilinear
    floors, fracs, masks_lo, masks_hi, clips_lo, clips_hi = [], [], [], [], [], []
    for d, n in enumerate(spatial):
        cd = c[..., d]
        f = jnp.floor(cd)
        fi = f.astype(jnp.int32)
        floors.append(fi)
        fracs.append(cd - f)
        masks_lo.append((fi >= 0) & (fi <= n - 1))
        masks_hi.append((fi + 1 >= 0) & (fi + 1 <= n - 1))
        clips_lo.append(jnp.clip(fi, 0, n - 1))
        clips_hi.append(jnp.clip(fi + 1, 0, n - 1))

    out = None
    for corner in range(2 ** ndim):
        flat = jnp.zeros(c.shape[:-1], dtype=jnp.int32)
        w = jnp.ones(c.shape[:-1], dtype=compute_dtype)
        m = jnp.ones(c.shape[:-1], dtype=bool)
        for d in range(ndim):
            hi = (corner >> d) & 1
            if hi:
                flat += clips_hi[d] * strides[d]
                w = w * fracs[d]
                m &= masks_hi[d]
            else:
                flat += clips_lo[d] * strides[d]
                w = w * (1.0 - fracs[d])
                m &= masks_lo[d]
        if padding == "zeros":
            w = w * m.astype(compute_dtype)
        tap = _gather_nd(vol_flat, flat) * w[:, None, :]
        out = tap if out is None else out + tap
    return out.reshape(B, C, *out_shape)


def grid_sample_normalized(vol, grid, mode="bilinear", padding="zeros",
                           taps_dtype=None, fast_vjp=False,
                           plane_window=None):
    """Like :func:`grid_sample` but ``grid`` holds [-1,1] normalized coords
    (align_corners=True), ``grid[..., d]`` indexing spatial axis ``d``."""
    spatial = vol.shape[2:]
    scale = jnp.asarray([(n - 1) * 0.5 for n in spatial], dtype=grid.dtype)
    coords = (grid + 1.0) * scale
    return grid_sample(vol, coords, mode=mode, padding=padding,
                       taps_dtype=taps_dtype, fast_vjp=fast_vjp,
                       plane_window=plane_window)


def warp_image(image, phi, mode="bilinear", zero_boundary=True,
               scale_intensity=True, taps_dtype=None, mesh=None,
               axis_name="data", fast_vjp=False, plane_window=None):
    """Warp ``image`` by map ``phi`` — the reference's ``Bilinear`` transform
    (``net_utils.py:9-56``) with its channel flip already folded in.

    Args:
      image: ``(B, C, D, W, H)``.
      phi: ``(B, 3, D, W, H)`` normalized map ([-1,1]); channel ``c``
        indexes spatial axis ``c``.
      zero_boundary: zeros padding if True else border (``net_utils.py:21``).
      scale_intensity: shift [-1,1] intensities to [0,1] around the warp
        (``net_utils.py:48-52``), so zeros padding maps to -1 background.
      mesh: optional ``jax.sharding.Mesh`` with a sharded batch axis
        ``axis_name``. The gather formulation folds the batch axis into a
        flat buffer and unrolls per element — under GSPMD that turns every
        per-element slice into a cross-device broadcast (volume-sized
        all-reduces every step; tests/test_scaling_model.py). Wrapping the
        warp in ``shard_map`` makes the unroll per-LOCAL-element: each chip
        warps only its own batch shard, with zero collectives.
    """
    if mesh is not None and mesh.devices.size > 1 \
            and image.shape[0] % mesh.devices.size == 0:
        from jax.sharding import PartitionSpec as _P
        spec = _P(axis_name)

        def _local(im, ph):
            return warp_image(im, ph, mode=mode,
                              zero_boundary=zero_boundary,
                              scale_intensity=scale_intensity,
                              taps_dtype=taps_dtype, fast_vjp=fast_vjp,
                              plane_window=plane_window)

        return jax.shard_map(_local, mesh=mesh, in_specs=(spec, spec),
                             out_specs=spec)(image, phi)

    grid = jnp.moveaxis(phi, 1, -1)  # (B, D, W, H, 3)
    padding = "zeros" if zero_boundary else "border"
    if scale_intensity:
        out = grid_sample_normalized((image + 1.0) * 0.5, grid, mode=mode,
                                     padding=padding, taps_dtype=taps_dtype,
                                     fast_vjp=fast_vjp,
                                     plane_window=plane_window)
        return out * 2.0 - 1.0
    return grid_sample_normalized(image, grid, mode=mode, padding=padding,
                                  taps_dtype=taps_dtype, fast_vjp=fast_vjp,
                                  plane_window=plane_window)


def resize_nearest_2d(img, out_hw):
    """torch ``F.interpolate(mode='nearest')`` for 2D: src = floor(dst*in/out).

    Used by the no-backprojection lift (``LiftRegDeformSubspace.py:63-64``,
    where the reference calls ``F.interpolate`` with the default mode).
    ``img``: (B, C, H, W) -> (B, C, out_hw[0], out_hw[1]).
    """
    B, C, H, W = img.shape
    oh, ow = out_hw
    ih = jnp.floor(jnp.arange(oh) * (H / oh)).astype(jnp.int32)
    iw = jnp.floor(jnp.arange(ow) * (W / ow)).astype(jnp.int32)
    return img[:, :, ih[:, None], iw[None, :]]


def _interp_matrix(n_out, n_in, dtype):
    """(n_out, n_in) align_corners=True linear-interpolation matrix: row i
    holds the 2-tap weights ``relu(1 - |c_i - j|)`` at
    ``c_i = i*(n_in-1)/(n_out-1)`` — the same formulation as the DRR
    projector's tensor-product resampling (ops/drr.py, DESIGN.md section 1)."""
    import numpy as np
    c = (np.linspace(0.0, n_in - 1.0, n_out) if n_out > 1
         else np.zeros((1,)))
    w = np.maximum(0.0, 1.0 - np.abs(c[:, None] - np.arange(n_in)[None, :]))
    return jnp.asarray(w, dtype)


def resize_trilinear(vol, out_shape):
    """Trilinear resize with align_corners=True (torch ``F.interpolate``
    ``mode='trilinear', align_corners=True``; used by the U-Net decoder,
    reference ``models/previous/RegNet2D3D.py:128-137``).

    The resize grid is a tensor product, so this is three axis-wise 2-tap
    interpolation matmuls on the MXU — not a gather. (The previous 8-corner
    gather formulation also made the RegNet2D3D decoder's XLA trace so
    large that 160^3 compiles took tens of minutes; VERDICT r2 #4.)
    """
    dtype = vol.dtype if jnp.issubdtype(vol.dtype, jnp.floating) \
        else jnp.float32
    out = vol.astype(dtype)
    for axis, (n_out, n_in) in enumerate(zip(out_shape, vol.shape[2:])):
        if n_out != n_in:
            w = _interp_matrix(n_out, n_in, dtype)
            out = jnp.moveaxis(
                jnp.tensordot(w, out, axes=[[1], [2 + axis]],
                              precision=jax.lax.Precision.HIGHEST),
                0, 2 + axis)
    return out
