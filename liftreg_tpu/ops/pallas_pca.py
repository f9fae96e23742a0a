"""Pallas streaming kernel for the PCA expansion (serving hot path).

``disp = coefs @ V + mean`` is a thin matmul: (B, L) x (L, 3N) with
L ≈ 56 and 3N ≈ 12.3M at 160³. It is purely HBM-bound on the basis read
(1.38 GB bf16), floor ≈ 2.4 ms at 819 GB/s — but the XLA lowering
measured 9.1 ms at B=4 (DESIGN.md §4a), consistent with the basis being
re-streamed per batch row for a tiny-M matmul. This kernel streams each
basis block exactly once and applies it to ALL batch rows, fusing the
mean add (the ``+ identity`` stays in XLA where it fuses with iota).

Forward-only by design: training keeps the XLA path (its backward
contracts over 3N, which XLA already streams once); the wrapper below is
a ``custom_vjp`` whose backward delegates to the XLA formulation, so the
kernel is safe to use under ``jax.grad`` too.

Reference context: ``F.linear(coefs, basis)`` at
``models/LiftRegDeformSubspaceBackproj.py:102``; XLA formulation in
``liftreg_tpu/models/subspace_backproj.py:expand_pca``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _expand_kernel(coefs_ref, v_ref, mean_ref, out_ref):
    """One basis block: out (B, Cb) = coefs (B, Lp) @ V (Lp, Cb) + mean."""
    disp = jnp.dot(coefs_ref[:], v_ref[:].astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    out_ref[:] = disp + mean_ref[:]          # mean block is (1, Cb)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def expand_pca_streamed(coefs, vectors, mean, block=32768, interpret=False):
    """coefs (B, L) f32, vectors (L, 3N) bf16/f32, mean (3N,) f32
    -> (B, 3N) f32. One streaming pass over ``vectors`` for all B."""
    return _expand_fwd_impl(coefs, vectors, mean, block, interpret)


def _expand_fwd_impl(coefs, vectors, mean, block, interpret):
    B, L = coefs.shape
    n = vectors.shape[1]
    block = min(block, n)
    while n % block and block > 128:
        block //= 2
    if n % block:
        # n has no power-of-two block divisor >= 128 (e.g. 3*50^3):
        # fall back to the XLA formulation rather than fail at trace time
        return jnp.dot(coefs.astype(jnp.bfloat16),
                       vectors.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32) + mean
    # pad L to the bf16 sublane tile so the dot is layout-clean
    Lp = max(16, (L + 15) // 16 * 16)
    if Lp != L:
        coefs = jnp.pad(coefs, ((0, 0), (0, Lp - L)))
        vectors = jnp.pad(vectors, ((0, Lp - L), (0, 0)))
    grid = (n // block,)
    out = pl.pallas_call(
        _expand_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, Lp), lambda i: (0, 0)),          # coefs
            pl.BlockSpec((Lp, block), lambda i: (0, i)),      # basis block
            pl.BlockSpec((1, block), lambda i: (0, i)),       # mean block
        ],
        out_specs=pl.BlockSpec((B, block), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((B, n), jnp.float32),
        interpret=interpret,
    )(coefs.astype(jnp.bfloat16), vectors, mean.reshape(1, n))
    return out


def _expand_fwd(coefs, vectors, mean, block, interpret):
    out = _expand_fwd_impl(coefs, vectors, mean, block, interpret)
    return out, (coefs, vectors)


def _expand_bwd(block, interpret, res, g):
    coefs, vectors = res
    # contraction over 3N: XLA streams both operands once — no re-read
    # pathology in this direction
    dcoefs = jnp.dot(g.astype(vectors.dtype), vectors.T,
                     preferred_element_type=jnp.float32)
    dvec = jnp.dot(coefs.T.astype(g.dtype), g,
                   preferred_element_type=jnp.float32).astype(vectors.dtype)
    dmean = jnp.sum(g, axis=0)
    return dcoefs.astype(coefs.dtype), dvec, dmean


expand_pca_streamed.defvjp(_expand_fwd, _expand_bwd)
