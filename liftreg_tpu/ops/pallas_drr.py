"""Pallas TPU kernel for the DRR projector.

The XLA formulation (``ops/drr.py``) runs the plane-chunked einsum at
~60 ms per 160^3/4-view projection — ~100x off the MXU roofline because the
per-plane (240x160)@(160x160)@(160x240) matmuls are small and the scan adds
scheduling overhead. This kernel fuses the whole projector into one
``pallas_call``: grid over (batch, pose, plane-chunk); each program keeps a
plane-chunk of the interpolation matrices and volume slab in VMEM, runs the
two-matmul chain per plane on the MXU and accumulates into the output block
(revisited across the sequential plane-chunk grid axis). The final
``dx * 0.1`` scaling fuses into the last chunk.

Numerics match :func:`liftreg_tpu.ops.drr.project_with_mats` with DEFAULT
(bf16-input) matmul precision; use the XLA path with ``precision=HIGHEST``
when bit-level parity against the torch oracle is required.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _proj_kernel(rx_ref, vol_ref, rz_ref, dx_ref, out_ref, *, plane_chunk):
    """One (batch, pose, plane-chunk) program.

    rx_ref:  (KC, res_d, D)   interpolation rows for this pose/chunk
    vol_ref: (D, KC, H)       volume slab for this chunk's planes
    rz_ref:  (KC, res_h, H)
    dx_ref:  (res_d, res_h)   per-ray path length for this pose
    out_ref: (res_d, res_h)   accumulated projection
    """
    kchunk = pl.program_id(2)
    nchunk = pl.num_programs(2)

    @pl.when(kchunk == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    def plane(k, acc):
        rx = rx_ref[k]                      # (res_d, D)
        s = vol_ref[:, k, :]                # (D, H)
        rz = rz_ref[k]                      # (res_h, H)
        t = jnp.dot(rx, s, preferred_element_type=jnp.float32)   # (res_d, H)
        return acc + jnp.dot(t, rz.T, preferred_element_type=jnp.float32)

    acc = jax.lax.fori_loop(0, plane_chunk, plane,
                            jnp.zeros_like(out_ref))
    out_ref[:] += acc

    @pl.when(kchunk == nchunk - 1)
    def _():
        out_ref[:] = out_ref[:] * dx_ref[:] * 0.1   # mm -> cm


def _backproj_kernel(bu_ref, proj_ref, bv_ref, out_ref, *, plane_chunk):
    """One (batch, pose, plane-chunk) program of the backprojection lift.

    bu_ref:  (KC, D, proj_w); proj_ref: (proj_w, proj_h);
    bv_ref:  (KC, H, proj_h); out_ref: (D, KC, H).
    """
    def plane(k, _):
        t = jnp.dot(bu_ref[k], proj_ref[:],
                    preferred_element_type=jnp.float32)      # (D, proj_h)
        out_ref[:, k, :] = jnp.dot(t, bv_ref[k].T,
                                   preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, plane_chunk, plane, 0)


def backproject_with_mats_pallas(proj, Bu, Bv, plane_chunk=16,
                                 interpret=False):
    """Pallas backprojector; same contract as ``drr.backproject_with_mats``.

    proj: (B, P, proj_w, proj_h); Bu: (P, W, D, proj_w);
    Bv: (P, W, H, proj_h) -> (B, P, D, W, H).
    """
    B, P, proj_w, proj_h = proj.shape
    D, H = Bu.shape[2], Bv.shape[2]
    W = Bu.shape[1]
    nchunk = -(-W // plane_chunk)
    pad = nchunk * plane_chunk - W
    if pad:
        Bu = jnp.pad(Bu, ((0, 0), (0, pad), (0, 0), (0, 0)))
        Bv = jnp.pad(Bv, ((0, 0), (0, pad), (0, 0), (0, 0)))
    Wp = W + pad

    kernel = functools.partial(_backproj_kernel, plane_chunk=plane_chunk)
    out = pl.pallas_call(
        kernel,
        grid=(B, P, nchunk),
        in_specs=[
            pl.BlockSpec((None, plane_chunk, D, proj_w),
                         lambda b, p, k: (p, k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, proj_w, proj_h),
                         lambda b, p, k: (b, p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, plane_chunk, H, proj_h),
                         lambda b, p, k: (p, k, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, None, D, plane_chunk, H),
                               lambda b, p, k: (b, p, 0, k, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, P, D, Wp, H), jnp.float32),
        interpret=interpret,
    )(Bu, proj, Bv)
    return out[:, :, :, :W, :]


def project_with_mats_pallas(vol, Rx, Rz, dx, plane_chunk=8,
                             interpret=False):
    """Pallas projector; same contract as ``drr.project_with_mats``.

    vol: (B, D, W, H); Rx: (P, W, res_d, D); Rz: (P, W, res_h, H);
    dx: (P, res_d, res_h) -> (B, P, res_d, res_h).

    ``plane_chunk=8`` is the largest that fits the 16 MB VMEM budget at the
    production 160^3/240^2 shape (chunk 16 overflows scoped vmem by ~5 MB
    on a real v5e; chunk < 8 violates the (8, 128) sublane tiling).
    On-chip status (2026-08, v5e): numerically validated (1.3e-3 vs the
    f32-HIGHEST XLA path — expected bf16 MXU input truncation), but NOT
    faster than the XLA scan formulation in ``ops/drr.py``, which stays the
    default everywhere; see DESIGN.md section 1.
    """
    B, D, W, H = vol.shape
    P = Rx.shape[0]
    res_d, res_h = Rx.shape[2], Rz.shape[2]
    nchunk = -(-W // plane_chunk)
    pad = nchunk * plane_chunk - W
    if pad:
        Rx = jnp.pad(Rx, ((0, 0), (0, pad), (0, 0), (0, 0)))
        Rz = jnp.pad(Rz, ((0, 0), (0, pad), (0, 0), (0, 0)))
        vol = jnp.pad(vol, ((0, 0), (0, 0), (0, pad), (0, 0)))
    Wp = W + pad

    grid = (B, P, nchunk)
    kernel = functools.partial(_proj_kernel, plane_chunk=plane_chunk)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, plane_chunk, res_d, D),
                         lambda b, p, k: (p, k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, D, plane_chunk, H),
                         lambda b, p, k: (b, 0, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, plane_chunk, res_h, H),
                         lambda b, p, k: (p, k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, res_d, res_h),
                         lambda b, p, k: (p, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, None, res_d, res_h),
                               lambda b, p, k: (b, p, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, P, res_d, res_h), jnp.float32),
        interpret=interpret,
    )(Rx, vol, Rz, dx)
