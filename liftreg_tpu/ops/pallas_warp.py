"""Pallas locality-exploiting trilinear warp (serving fast path, opt-in).

The warp is 70% of the serving budget (DESIGN.md §4a) and XLA lowers its
arbitrary 3D gather at ~6.5 ns/index — HBM-latency-bound random access,
~2.5 GB/s effective against an ~819 GB/s streaming roofline. Deformation
fields are *smooth and small* (respiratory motion is a few voxels at
2.2 mm spacing), which XLA's general gather cannot exploit. This kernel
can: the whole source volume is staged in VMEM once and each output
(z, x)-plane is assembled from

  * a per-lane **sublane gather** along z (Mosaic ``tpu.dynamic_gather``;
    the z displacement is therefore UNBOUNDED — z is the large-motion
    SI axis for lung CT),
  * a small **fori enumeration of source y-planes** ``v = y0 + dy − y``
    (bounded by ``dy_max``), each a contiguous VMEM slice,
  * a small **static enumeration of x lane-shifts** ``t = x0 + dx − x``
    (bounded by ``dx_max``) via ``pltpu.roll``.

Mosaic's gather only supports same-shape 2D operands (per-lane row
selection; jax/_src/pallas/mosaic/lowering.py ``_gather_lowering_rule``),
which is why exactly one axis (z) gets the free arbitrary gather and the
other two are enumerated. Per-(v) and per-(t) runtime skips
(``lax.cond`` on "any voxel needs this shift") make the cost adaptive:
a smooth field with local y/x displacement range ±r pays ~O(r²) gathers
per plane, not O(dy_max·dx_max).

Semantics: matches ``resample._oct_plain`` (bf16 taps, f32 weights,
align_corners pixel coords, zeros/border padding via clamped starts +
vanishing weights) EXACTLY whenever every voxel's y/x displacement obeys
``|y0+dy − y| ≤ dy_max`` and ``|x0 − x| ≤ dx_max``; voxels beyond the
window sample at the window-clamped offset instead (graceful clamp, like
border padding in the offending axis). Use :func:`displacement_window`
to measure a field's true window before enabling. Differentiable wrt
the COORDS only (:func:`warp_plane_sample` — the ``with_grad`` kernel
variant emits analytic ∂out/∂coords planes from the same gathers, so
the VJP is elementwise); the image cotangent is fail-loud NaN, so
image-differentiating users (RegNet's inverse flow) keep the
``fast_vjp`` quad/oct paths (``resample.grid_sample``).

Reference context: the warp this accelerates is the reference's
``Bilinear`` transform (``src/liftreg/utils/net_utils.py:9-56``).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _relu_tri(t):
    """relu hat weight and its derivative: ``max(0, 1-|t|)``,
    ``-sign(t)`` inside the support (the plain-AD subgradient)."""
    w = jnp.maximum(0.0, 1.0 - jnp.abs(t))
    dw = jnp.where(w > 0.0, -jnp.sign(t), 0.0)
    return w, dw


def _warp_plane_kernel(pz_ref, py_ref, px_ref, vol_ref, out_ref, *args,
                       D, W, H, dy_max, dx_max, padding, with_grad=False):
    """One output (z, x)-plane at y = program_id(0).

    Refs: pz/py/px (1, D, Hp) f32 pixel coords; vol (W*D, Hp) taps;
    out (1, D, Hp) f32. Hp is the lane-padded H (zero-filled — pad lanes
    get zero weight automatically because their ``s = x0 − x`` falls
    outside the enumerated window). With ``with_grad`` a second output
    ref (1, 3, D, Hp) receives the analytic (∂out/∂pz, ∂out/∂py,
    ∂out/∂px) planes, computed from the SAME gathers (the residuals of
    :func:`warp_plane_sample`'s custom VJP).
    """
    dc_ref = args[0] if with_grad else None
    y = pl.program_id(0)
    Hp = vol_ref.shape[1]
    f32 = jnp.float32

    pz = pz_ref[0]
    py = py_ref[0]
    px = px_ref[0]
    if padding == "border":
        # pre-clamp; gradient is zeroed outside (plain-AD clip convention)
        bz = (pz > 0.0) & (pz < D - 1.0)
        by = (py > 0.0) & (py < W - 1.0)
        bx = (px > 0.0) & (px < H - 1.0)
        pz = jnp.clip(pz, 0.0, D - 1.0)
        py = jnp.clip(py, 0.0, W - 1.0)
        px = jnp.clip(px, 0.0, H - 1.0)

    # oct-path geometry: starts clamped to n-2, relu corner weights
    z0 = jnp.clip(jnp.floor(pz).astype(jnp.int32), 0, D - 2)
    wz0, dwz0 = _relu_tri(pz - z0.astype(f32))
    wz1, dwz1 = _relu_tri(pz - z0.astype(f32) - 1.0)
    y0 = jnp.clip(jnp.floor(py).astype(jnp.int32), 0, W - 2)
    wy0, dwy0 = _relu_tri(py - y0.astype(f32))
    wy1, dwy1 = _relu_tri(py - y0.astype(f32) - 1.0)
    x0 = jnp.clip(jnp.floor(px).astype(jnp.int32), 0, H - 2)
    wx0, dwx0 = _relu_tri(px - x0.astype(f32))
    wx1, dwx1 = _relu_tri(px - x0.astype(f32) - 1.0)

    x_iota = jax.lax.broadcasted_iota(jnp.int32, (D, Hp), 1)
    # window-clamped shifts (out-of-window voxels degrade to clamped
    # sampling; exact when the field obeys the window)
    s = jnp.clip(x0 - x_iota, -dx_max, dx_max)          # x0 = x + s
    u = jnp.clip(y0 - y, -dy_max, dy_max)               # y0 = y + u

    nv = 2 * dy_max + 2
    zero = jnp.zeros((D, Hp), f32)
    # acc, dz_acc, dy_acc, dx_acc (the latter three only when with_grad)
    n_acc = 4 if with_grad else 1
    accs = (zero,) * n_acc

    # t outer (static, unrolled), v inner (fori): everything that depends
    # only on t — the x weight, the rolled z indices and the rolled y/z
    # weight planes — is computed ONCE per shift, and the v loop
    # accumulates in ROLLED space so the inner body is 2 gathers + fma
    # with zero rolls (one un-roll per active t at the end). pltpu.roll is
    # circular with jnp.roll semantics and wants non-negative static
    # shifts, hence % Hp; the circular wrap is safe because wxt vanishes
    # wherever x+t would leave [0, H) (clamped starts).
    for t in range(-dx_max, dx_max + 2):
        # x weight for source lane x+t: dx=0 corner when s==t, dx=1
        # when s==t-1
        m0, m1 = s == t, s == t - 1
        wxt = jnp.where(m0, wx0, 0.0) + jnp.where(m1, wx1, 0.0)
        dwxt = (jnp.where(m0, dwx0, 0.0) + jnp.where(m1, dwx1, 0.0)) \
            if with_grad else None

        def shift_active(accs, t=t, wxt=wxt, dwxt=dwxt):
            if t:
                r = functools.partial(pltpu.roll, shift=t % Hp, axis=1)
            else:
                r = lambda a: a  # noqa: E731
            jz0 = r(z0)
            wz0_r, wz1_r = r(wz0), r(wz1)
            u_r = r(u)
            wy0_r, wy1_r = r(wy0), r(wy1)
            if with_grad:
                dwz0_r, dwz1_r = r(dwz0), r(dwz1)
                dwy0_r, dwy1_r = r(dwy0), r(dwy1)
            jz1 = jnp.minimum(jz0 + 1, D - 1)

            def v_body(i, a_ts):
                v = i - dy_max                   # [-dy_max, dy_max+1]
                # weight of source plane y+v (in rolled space): dy=0
                # corner when u==v, dy=1 when u==v-1
                mv0, mv1 = u_r == v, u_r == v - 1
                wyv_r = (jnp.where(mv0, wy0_r, 0.0)
                         + jnp.where(mv1, wy1_r, 0.0))

                def gather(a_ts):
                    yv = jnp.clip(y + v, 0, W - 1)
                    sv = vol_ref[pl.ds(yv * D, D), :]    # (D, Hp) taps
                    g0 = jnp.take_along_axis(sv, jz0, axis=0).astype(f32)
                    g1 = jnp.take_along_axis(sv, jz1, axis=0).astype(f32)
                    gz = wz0_r * g0 + wz1_r * g1
                    if not with_grad:
                        return (a_ts[0] + wyv_r * gz,)
                    dwyv_r = (jnp.where(mv0, dwy0_r, 0.0)
                              + jnp.where(mv1, dwy1_r, 0.0))
                    return (a_ts[0] + wyv_r * gz,
                            a_ts[1] + wyv_r * (dwz0_r * g0 + dwz1_r * g1),
                            a_ts[2] + dwyv_r * gz)

                return jax.lax.cond(jnp.any(wyv_r > 0.0), gather,
                                    lambda a: a, a_ts)

            n_t = 3 if with_grad else 1
            a_ts = jax.lax.fori_loop(0, nv, v_body, (zero,) * n_t)
            if t:
                rb = functools.partial(pltpu.roll, shift=(-t) % Hp, axis=1)
                a_ts = tuple(rb(a) for a in a_ts)
            if not with_grad:
                return (accs[0] + wxt * a_ts[0],)
            return (accs[0] + wxt * a_ts[0],
                    accs[1] + wxt * a_ts[1],
                    accs[2] + wxt * a_ts[2],
                    accs[3] + dwxt * a_ts[0])

        accs = jax.lax.cond(jnp.any(wxt > 0.0), shift_active,
                            lambda a: a, accs)
    out_ref[0] = accs[0]
    if with_grad:
        dz_acc, dy_acc, dx_acc = accs[1], accs[2], accs[3]
        if padding == "border":
            dz_acc = jnp.where(bz, dz_acc, 0.0)
            dy_acc = jnp.where(by, dy_acc, 0.0)
            dx_acc = jnp.where(bx, dx_acc, 0.0)
        dc_ref[0, 0] = dz_acc
        dc_ref[0, 1] = dy_acc
        dc_ref[0, 2] = dx_acc


def warp_plane_gather(vol, coords, padding="zeros", dy_max=6, dx_max=6,
                      taps_dtype=jnp.bfloat16, interpret="auto"):
    """Locality-exploiting trilinear sample of ``vol`` at pixel ``coords``.

    Args:
      vol: ``(B, C, D, W, H)``.
      coords: ``(B, D, W, H, 3)`` pixel-space sample positions in (z, y, x)
        order — i.e. the warp use case where the output grid matches the
        volume grid (``resample.warp_image``).
      padding: ``"zeros"`` or ``"border"`` (same semantics as
        ``resample.grid_sample``).
      dy_max / dx_max: y/x displacement window in voxels. Exact within the
        window; clamped-sample beyond it (see module docstring).
      taps_dtype: tap storage dtype inside VMEM; ``jnp.bfloat16`` matches
        the oct serving path, ``jnp.float32`` is exact (2x VMEM).
      interpret: run the Pallas interpreter; ``"auto"`` (default)
        interprets on CPU backends so tests and CPU meshes exercise the
        same call sites the TPU compiles.

    Returns:
      ``(B, C, D, W, H)`` f32.
    """
    out, _ = _plane_impl(vol, coords, padding, dy_max, dx_max, taps_dtype,
                         interpret, with_grad=False)
    return out


def _plane_impl(vol, coords, padding, dy_max, dx_max, taps_dtype,
                interpret, with_grad):
    """Shared prep + pallas_call; returns ``(out, dcoords_or_None)``."""
    if interpret == "auto":
        interpret = jax.default_backend() == "cpu"
    B, C, D, W, H = vol.shape
    assert coords.shape == (B, D, W, H, 3), coords.shape
    Hp = max(128, -(-H // 128) * 128)

    # y-major layouts so each grid step slices contiguous planes
    volp = jnp.transpose(vol, (0, 1, 3, 2, 4)).astype(taps_dtype)
    volp = jnp.pad(volp, ((0, 0),) * 4 + ((0, Hp - H),))
    volp = volp.reshape(B, C, W * D, Hp)
    cp = jnp.transpose(coords.astype(jnp.float32), (0, 2, 4, 1, 3))
    cp = jnp.pad(cp, ((0, 0), (0, 0), (0, 0), (0, 0), (0, Hp - H)))
    # (B, W, 3, D, Hp) -> per-component (B, W, D, Hp)
    pz, py, px = cp[:, :, 0], cp[:, :, 1], cp[:, :, 2]

    kern = functools.partial(_warp_plane_kernel, D=D, W=W, H=H,
                             dy_max=dy_max, dx_max=dx_max, padding=padding,
                             with_grad=with_grad)
    plane = pl.BlockSpec((1, D, Hp), lambda y: (y, 0, 0))
    out_specs = plane if not with_grad else \
        [plane, pl.BlockSpec((1, 3, D, Hp), lambda y: (y, 0, 0, 0))]
    out_shape = jax.ShapeDtypeStruct((W, D, Hp), jnp.float32)
    if with_grad:
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((W, 3, D, Hp), jnp.float32)]
    call = pl.pallas_call(
        kern,
        grid=(W,),
        in_specs=[plane, plane, plane,                       # pz, py, px
                  pl.BlockSpec((W * D, Hp), lambda y: (0, 0))],  # volume
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )
    outs, dcs = [], []
    for b in range(B):
        for c in range(C):
            o = call(pz[b], py[b], px[b], volp[b, c])
            if with_grad:
                o, dc = o
                # (W, 3, D, Hp) -> (D, W, H, 3)
                dcs.append(jnp.transpose(dc, (2, 0, 3, 1))[:, :, :H])
            outs.append(jnp.transpose(o, (1, 0, 2))[:, :, :H])
    out = jnp.stack(outs).reshape(B, C, D, W, H)
    if not with_grad:
        return out, None
    # sum the per-channel coordinate sensitivities is the CALLER's job
    # (the cotangent contracts over C); keep them separate here
    dc = jnp.stack(dcs).reshape((B, C, D, W, H, 3))
    return out, dc


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def warp_plane_sample(padding, dy_max, dx_max, taps_name, interpret,
                      vol, coords):
    """Differentiable (wrt ``coords`` ONLY) Pallas locality warp.

    Static args lead (custom_vjp nondiff_argnums); ``taps_name`` is the
    dtype NAME string ("bfloat16"/"float32") so it stays hashable.

    Same primal as :func:`warp_plane_gather`; under ``jax.grad`` the
    forward runs the ``with_grad`` kernel variant which emits the
    analytic (∂out/∂pz, ∂out/∂py, ∂out/∂px) planes from the SAME gathers,
    so the backward is a pure elementwise contraction — no re-gather, no
    scatter. The ``vol`` cotangent is NaN by design: this kernel has no
    image gradient (the refinement/serving paths never differentiate wrt
    the image); a caller that does differentiate it gets loud NaNs, not
    silently-wrong zeros.
    """
    return warp_plane_gather(vol, coords, padding=padding, dy_max=dy_max,
                             dx_max=dx_max, taps_dtype=jnp.dtype(taps_name),
                             interpret=interpret)


def _plane_sample_fwd(padding, dy_max, dx_max, taps_name, interpret,
                      vol, coords):
    out, dc = _plane_impl(vol, coords, padding, dy_max, dx_max,
                          jnp.dtype(taps_name), interpret, with_grad=True)
    return out, (dc, vol)


def _plane_sample_bwd(padding, dy_max, dx_max, taps_name, interpret,
                      res, g):
    dc, vol = res
    # contract the cotangent over the output; sum channel contributions
    d_coords = jnp.sum(g[..., None] * dc, axis=1)        # (B, D, W, H, 3)
    d_vol = jnp.full_like(vol, jnp.nan)                  # fail-loud (doc)
    return d_vol, d_coords


warp_plane_sample.defvjp(_plane_sample_fwd, _plane_sample_bwd)


def displacement_window(coords):
    """Measure a coords field's true (dy, dx) window.

    Returns ``(max |y0 − y|, max |x0 − x|)`` over the clamped interpolation
    starts — the smallest ``dy_max``/``dx_max`` for which
    :func:`warp_plane_gather` is exact on this field. Cheap XLA
    reduction; run once per model / dataset when enabling the kernel.
    """
    B, D, W, H = coords.shape[:-1]
    yi = jnp.arange(W, dtype=coords.dtype)[None, None, :, None]
    xi = jnp.arange(H, dtype=coords.dtype)[None, None, None, :]
    y0 = jnp.clip(jnp.floor(coords[..., 1]), 0, W - 2)
    x0 = jnp.clip(jnp.floor(coords[..., 2]), 0, H - 2)
    return jnp.max(jnp.abs(y0 - yi)), jnp.max(jnp.abs(x0 - xi))
