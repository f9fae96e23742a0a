"""Micro-benchmark: Mosaic ``tpu.dynamic_gather`` / ``pltpu.roll`` throughput.

Go/no-go data for a Pallas warp kernel (DESIGN.md §3). XLA lowers the
warp's arbitrary gather at ~6.5 ns/index — HBM-latency-bound random
access, ~2.5 GB/s effective vs the ~819 GB/s streaming roofline. A
locality-exploiting Pallas kernel (source slab staged in VMEM, z resolved
by per-lane sublane gather, small y/x shifts enumerated with masks) is
only worth building if VMEM-resident ``dynamic_gather`` is decisively
faster per element than XLA's global gather. Mosaic constraint
(jax/_src/pallas/mosaic/lowering.py:_gather_lowering_rule): operand,
indices and output must be the SAME 2D shape; gather runs along sublanes
(axis 0) or lanes (axis 1). So the kernel shape frontier here is
(rows, lanes) tiles at the volume's plane sizes.

Prints ns/element for:
  * sublane-axis dynamic_gather at (8..1280, 128/256) tiles
  * lane-axis dynamic_gather
  * pltpu.roll along lanes
  * the composed warp inner step: gather + mask + fma

Usage: python tools/bench_mosaic_gather.py [--interpret] [--reps 5]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools._timing import print_calibration, timed_ms  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--interpret", action="store_true",
                    help="CPU interpret mode (correctness only)")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--inner", type=int, default=8,
                    help="gathers per grid step (defeats per-call overhead)")
    ap.add_argument("--grid", type=int, default=64,
                    help="grid steps per pallas_call")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
    G, T = args.inner, args.grid

    if not args.interpret:
        print_calibration()

    def timed(fn, *xs, reps):
        return timed_ms(fn, *xs, reps=reps, warmup=1) / 1000.0

    def report(name, secs, elems):
        print(f"{name:<44} {secs * 1e3:8.3f} ms  "
              f"{secs / elems * 1e9:8.3f} ns/elem", flush=True)

    results = {}

    def run(name, kernel, M, L, idx_mod, dtype=jnp.float32):
        """Time `kernel` (x_ref, idx_ref, o_ref) doing G ops over a T-grid."""
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (M, L), dtype)
        idx = jax.random.randint(jax.random.PRNGKey(1), (M, L), 0, idx_mod,
                                 jnp.int32)
        f = pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=[pl.BlockSpec((M, L), lambda i: (0, 0)),
                      pl.BlockSpec((M, L), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((M, L), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((M, L), dtype),
            interpret=args.interpret,
        )
        f = jax.jit(f)
        try:
            secs = timed(f, x, idx, reps=args.reps)
        except Exception as e:  # noqa: BLE001 - report unsupported shapes
            print(f"{name:<44} FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:90]}", flush=True)
            return None
        elems = T * G * M * L
        report(name, secs, elems)
        results[name] = secs / elems * 1e9
        return secs

    def gather_sub_kernel(x_ref, idx_ref, o_ref):
        x, idx = x_ref[:], idx_ref[:]
        M = x.shape[0]
        acc = jnp.zeros_like(x)
        for k in range(G):
            j = jnp.remainder(idx + k, M)
            acc = acc + jnp.take_along_axis(x, j, axis=0)
        o_ref[:] = acc

    def gather_lane_kernel(x_ref, idx_ref, o_ref):
        x, idx = x_ref[:], idx_ref[:]
        L = x.shape[1]
        acc = jnp.zeros_like(x)
        for k in range(G):
            j = jnp.remainder(idx + k, L)
            acc = acc + jnp.take_along_axis(x, j, axis=1)
        o_ref[:] = acc

    def roll_kernel(x_ref, idx_ref, o_ref):
        del idx_ref
        x = x_ref[:]
        acc = jnp.zeros_like(x)
        for k in range(G):
            acc = acc + pltpu.roll(x, shift=k + 1, axis=1)
        o_ref[:] = acc

    def warp_step_kernel(x_ref, idx_ref, o_ref):
        """The future warp kernel's inner (u,t) iteration: one sublane
        gather + shift-mask + weighted accumulate."""
        x, idx = x_ref[:], idx_ref[:]
        M = x.shape[0]
        acc = jnp.zeros_like(x)
        w = x * 0.25
        for k in range(G):
            j = jnp.remainder(idx + k, M)
            g = jnp.take_along_axis(x, j, axis=0)
            mask = (jnp.remainder(idx, 7) == k % 7)
            acc = acc + jnp.where(mask, g * w, 0.0)
        o_ref[:] = acc

    print(f"interpret={args.interpret} inner={G} grid={T} "
          f"reps={args.reps}", flush=True)
    if not args.interpret:
        import jax as _j
        print("device:", _j.devices()[0], flush=True)

    for M, L in ((8, 128), (64, 128), (160, 128), (160, 256),
                 (512, 128), (1280, 128), (160, 160)):
        run(f"dyn_gather sublane ({M},{L}) f32", gather_sub_kernel, M, L, M)
    for M, L in ((160, 128), (160, 256), (1280, 128)):
        run(f"dyn_gather sublane ({M},{L}) bf16", gather_sub_kernel, M, L, M,
            dtype=jnp.bfloat16)
    for M, L in ((160, 128), (160, 256)):
        run(f"dyn_gather lane    ({M},{L}) f32", gather_lane_kernel, M, L, L)
    for M, L in ((160, 128), (160, 256)):
        run(f"roll lanes         ({M},{L}) f32", roll_kernel, M, L, L)
    for M, L in ((160, 128), (160, 256), (1280, 128)):
        run(f"warp inner step    ({M},{L}) f32", warp_step_kernel, M, L, M)

    # decision line: XLA's measured law is ~6.5 ns/INDEX (each index
    # fetches an 8-wide row, i.e. ~0.8 ns/element at serving width);
    # the Pallas plan needs ~R_enum x more gathered elements than XLA has
    # indices, so it wins iff ns/elem << 6.5 / R_enum (R_enum ~ 20-40).
    best = min((v for v in results.values()), default=float("nan"))
    print(f"\nbest ns/elem: {best:.3f}  "
          f"(XLA warp law: 6.5 ns/index; Pallas wins decisively below "
          f"~0.2 ns/elem, loses above ~0.6)", flush=True)


if __name__ == "__main__":
    main()
