"""Minimal repro: Mosaic remote-compile HTTP 500 on sublane dynamic_gather.

Round-4/5 finding (VERDICT item 2): every Pallas locality-warp kernel
(`liftreg_tpu/ops/pallas_warp.py`) fails to compile on the real v5e with
``MosaicError: INTERNAL: .../remote_compile: HTTP 500: tpu_compile_helper
subprocess ex[ception]``. This file is the smallest kernel that triggers
it, plus a shape bisect proving the failure is a deterministic function
of shape — a compiler-backend crash, not infra flakiness:

  * ONE ``tpu.dynamic_gather`` along sublanes, no grid, no masks, no
    multi-output, f32 only.
  * (8, 128) compiles and runs; every tested shape with more than 8
    sublanes (16..160 rows) crashes the compile helper.
  * Lane-axis gather compiles at (160, 128) but crashes at (160, 256).

Together with the measured throughput of the shapes that DO compile
(best 0.715 ns/elem roll, 1.24 ns/elem lane gather — above the 0.6
ns/elem lose threshold from DESIGN.md §4a's 6.5 ns/index XLA warp law),
this closes the Pallas-warp question: no compilable configuration can
beat the XLA oct path on current Mosaic. See DESIGN.md §3 "Pallas warp:
definitive no-go (round 5)".

Usage: python tools/repro_mosaic_gather_500.py
"""
from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    print(f"jax {jax.__version__}  device: {jax.devices()[0]}")

    def kernel(src_ref, idx_ref, out_ref, *, axis):
        # the minimal op under test: one same-shape take_along_axis (Mosaic
        # lowers it to tpu.dynamic_gather), nothing else
        out_ref[...] = jnp.take_along_axis(
            src_ref[...], idx_ref[...], axis=axis)

    def try_shape(rows, lanes, axis, dtype=jnp.float32):
        shape = (rows, lanes)
        f = pl.pallas_call(
            functools.partial(kernel, axis=axis),
            out_shape=jax.ShapeDtypeStruct(shape, dtype),
        )
        src = jnp.arange(rows * lanes, dtype=dtype).reshape(shape)
        idx = jnp.zeros(shape, jnp.int32)
        tag = f"dynamic_gather axis={axis} {shape} {jnp.dtype(dtype).name}"
        try:
            jax.block_until_ready(jax.jit(f)(src, idx))
            print(f"  OK    {tag}")
            return True
        except Exception as e:  # noqa: BLE001 — we are cataloguing crashes
            msg = str(e).split("\n")[0][:110]
            print(f"  FAIL  {tag}: {msg}")
            return False

    print("sublane-axis gather, shape bisect over rows:")
    for rows in (8, 16, 24, 32, 64, 128, 160):
        try_shape(rows, 128, axis=0)
    print("lane-axis gather:")
    for lanes in (128, 256):
        try_shape(160, lanes, axis=1)
    print("bf16 sublane at the working row count:")
    try_shape(8, 128, axis=0, dtype=jnp.bfloat16)


if __name__ == "__main__":
    main()
