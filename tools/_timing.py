"""Shared on-chip timing helper for the profiling/bench tools.

Under the axon tunnel, ``jax.block_until_ready`` returns at DISPATCH, so
timing loops fenced by it measure nothing (queue6's profile_refine runs
printed 0.0 ms for 160^3 warps).  A single scalar readback of only the
LAST rep's output is not proven to fence the whole stream either.  The
one pattern that has produced verified-sane numbers on this link is
bench.py's (bench.py:167-189): chain every rep's output into a scalar
accumulator and read the accumulator back once — the readback then
data-depends on every rep, regardless of stream ordering or any
dedup/caching the relay might do for repeated identical executions.

``calibrate()`` times a known-FLOP matmul so a broken harness is
self-evident in every log (a ~0 ms or >1 PFLOP/s row means: distrust
the whole run).
"""
from __future__ import annotations

import time


def timed_ms(fn, *args, reps: int = 10, warmup: int = 2) -> float:
    """Mean wall-clock ms per call of ``fn(*args)`` with a per-rep
    data-dependency chain forcing real device execution of every rep."""
    import jax
    import jax.numpy as jnp

    def leaf(o):
        return jax.tree_util.tree_leaves(o)[0]

    acc = jnp.float32(0.0)
    for _ in range(max(1, warmup)):
        acc = acc + jnp.sum(leaf(fn(*args))).astype(jnp.float32)
    float(acc)
    t0 = time.perf_counter()
    acc = jnp.float32(0.0)
    for _ in range(reps):
        acc = acc + jnp.sum(leaf(fn(*args))).astype(jnp.float32)
    float(acc)
    return (time.perf_counter() - t0) / reps * 1000.0


def calibrate(n: int = 4096, reps: int = 4) -> tuple[float, float]:
    """Time an n x n @ n x n f32 matmul; returns (ms, achieved TFLOP/s).

    v5e MXU peak is ~197 bf16 / ~49 f32 TFLOP/s; a reading far above
    peak (or ~0 ms) means the timing harness is not syncing."""
    import jax
    import jax.numpy as jnp

    a = jax.random.normal(jax.random.PRNGKey(0), (n, n), jnp.float32)
    f = jax.jit(lambda x: x @ x)
    ms = timed_ms(f, a, reps=reps, warmup=2)
    tflops = (2 * n ** 3) / (ms * 1e-3) / 1e12 if ms > 1e-6 else float("inf")
    return ms, tflops


def print_calibration() -> None:
    ms, tflops = calibrate()
    suspect = " !! HARNESS SUSPECT (above f32 peak)" if tflops > 60 else ""
    print(f"{'calib matmul 4096^2':<26} {ms:9.1f} ms  "
          f"({tflops:.1f} TFLOP/s f32){suspect}", flush=True)
