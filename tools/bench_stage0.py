"""Micro-benchmark: encoder stage-0 conv variants on the real chip.

DESIGN.md §4a measured the encoder's stage-0 conv (3³, C=5→16, stride 1,
160³) at 26.2 ms for a B=4 bf16 batch — ~19× above its ~1.4 ms HBM floor
and the single biggest non-warp line in the serving budget. This tool
exists to find out *why* before building anything: it times XLA variants
(layouts, dtypes, padded channel counts) with streamed dispatch (one
readback per N iterations — the axon tunnel adds a ~32 ms sync floor to
every readback, DESIGN.md §7) and optionally dumps the optimized HLO so
the dominant fusion is visible.

Usage:
    python tools/bench_stage0.py [--iters 20] [--batch 4] [--size 160]
                                 [--dump-hlo DIR]

Reference context: the stage-0 conv is the first ConvBlock of
SubspaceEncoder (liftreg_tpu/models/subspace_backproj.py:43-47), i.e. the
reference's first `convBlock` (src/liftreg/layers/layers.py:335-372).
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, args, iters, warmup=3):
    """Streamed timing: `iters` dispatches, one scalar readback."""
    out = fn(*args)
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
    for _ in range(warmup):
        out = fn(*args)
    # force completion of warmup before the timed window
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    t0 = time.perf_counter()
    acc = None
    for _ in range(iters):
        out = fn(*args)
        o = out[0] if isinstance(out, tuple) else out
        acc = jnp.sum(o) if acc is None else acc + jnp.sum(o)
    float(acc)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def conv_cl(x, w, b, slope=0.2, stride=1):
    """Channels-last conv, the shipped formulation (flax nn.Conv path)."""
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NDHWC", "DHWIO", "NDHWC"))
    y = jax.lax.conv_general_dilated(
        x, w, (stride,) * 3, [(1, 1)] * 3, dimension_numbers=dn)
    return jax.nn.leaky_relu(y + b, slope)


def conv_cf(x, w, b, slope=0.2, stride=1):
    """Channels-first (NCDHW) conv on the same data."""
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NCDHW", "DHWIO", "NCDHW"))
    y = jax.lax.conv_general_dilated(
        x, w, (stride,) * 3, [(1, 1)] * 3, dimension_numbers=dn)
    return jax.nn.leaky_relu(y + b[:, None, None, None], slope)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--size", type=int, default=160)
    ap.add_argument("--cin", type=int, default=5)
    ap.add_argument("--cout", type=int, default=16)
    ap.add_argument("--dump-hlo", default=None,
                    help="directory to write optimized HLO text into")
    args = ap.parse_args()

    B, S, C, F = args.batch, args.size, args.cin, args.cout
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    # generate on device: host staging can run at ~14 MB/s after a crashed
    # compile (DESIGN.md §7)
    x32 = jax.random.normal(k1, (B, S, S, S, C), jnp.float32)
    w32 = jax.random.normal(k2, (3, 3, 3, C, F), jnp.float32) * 0.1
    b32 = jax.random.normal(k3, (F,), jnp.float32) * 0.1

    results = {}

    def run(name, fn, *a):
        f = jax.jit(fn)
        if args.dump_hlo:
            txt = f.lower(*a).compile().as_text()
            path = f"{args.dump_hlo}/stage0_{name}.hlo.txt"
            with open(path, "w") as fh:
                fh.write(txt)
            print(f"# wrote {path} ({len(txt)} bytes)")
        ms = timed(f, a, args.iters)
        results[name] = ms
        print(f"{name:32s} {ms:8.2f} ms/batch  ({ms / B:6.2f} ms/elem)")

    x16, w16, b16 = (x32.astype(jnp.bfloat16), w32.astype(jnp.bfloat16),
                     b32.astype(jnp.bfloat16))
    run("cl_f32", conv_cl, x32, w32, b32)
    run("cl_bf16", conv_cl, x16, w16, b16)

    xcf = jnp.moveaxis(x16, -1, 1)
    run("cf_bf16", conv_cf, xcf, w16, b16)

    # channel padding: is C=5 the pathology? pad to 8 and 16 with zeros
    for cpad in (8, 16):
        xp = jnp.pad(x16, ((0, 0),) * 4 + ((0, cpad - C),))
        wp = jnp.pad(w16, ((0, 0),) * 3 + ((0, cpad - C), (0, 0)))
        run(f"cl_bf16_cpad{cpad}",
            lambda x, w, b: conv_cl(x, w, b), xp, wp, b16)

    # the training cost: filter gradient (input is stop_gradient in the
    # flagship model, so only w/b grads matter — subspace_backproj.py:118)
    def loss(w, b, x):
        return jnp.sum(conv_cl(x, w, b) ** 2)

    gf = jax.jit(jax.grad(loss, argnums=(0, 1)))
    if args.dump_hlo:
        txt = gf.lower(w16, b16, x16).compile().as_text()
        with open(f"{args.dump_hlo}/stage0_kgrad_bf16.hlo.txt", "w") as fh:
            fh.write(txt)
    ms = timed(lambda w, b, x: gf(w, b, x)[0], (w16, b16, x16), args.iters)
    results["kgrad_bf16 (fwd+dw+db)"] = ms
    print(f"{'kgrad_bf16 (fwd+dw+db)':32s} {ms:8.2f} ms/batch")

    # stage-1 shape for context: 16->32 stride 2 at full res
    x1 = jax.random.normal(k1, (B, S, S, S, 16), jnp.bfloat16)
    w1 = jax.random.normal(k2, (3, 3, 3, 16, 32), jnp.bfloat16) * 0.1
    b1 = jnp.zeros((32,), jnp.bfloat16)
    run("stage1_cl_bf16_s2",
        lambda x, w, b: conv_cl(x, w, b, stride=2), x1, w1, b1)

    # ---- the space-to-depth pair (models/s2d.py) vs the ConvBlock pair
    from liftreg_tpu.models.s2d import conv_pair_s2d

    w0f = jnp.asarray(w32, jnp.float32)
    w1f = jax.random.normal(k2, (3, 3, 3, F, 32), jnp.float32) * 0.1
    b1f = jnp.zeros((32,), jnp.float32)

    def pair_ref(x, w0, b0, w1, b1):
        y = conv_cl(x, w0, b0)
        return conv_cl(y, w1, b1, stride=2)

    def pair_s2d(x, w0, b0, w1, b1):
        return conv_pair_s2d(x, w0, b0, w1, b1, dtype=jnp.bfloat16)

    run("pair01_convblock_bf16", pair_ref, x16, w16, b16,
        w1f.astype(jnp.bfloat16), b1f.astype(jnp.bfloat16))
    run("pair01_s2d_bf16", pair_s2d, x32, w0f, b32, w1f, b1f)

    # training cost of the pair: grads wrt all four params (input is
    # stop_gradient in the flagship model); jax.checkpoint mirrors the
    # encoder's per-stage remat
    def gpair(fn):
        def loss(p, x):
            return jnp.sum(jax.checkpoint(fn)(x, *p) ** 2)
        g = jax.jit(jax.grad(loss))
        params_ = ((w16, b16, w1f.astype(jnp.bfloat16),
                    b1f.astype(jnp.bfloat16)) if fn is pair_ref
                   else (w0f, b32, w1f, b1f))
        xx = x16 if fn is pair_ref else x32
        return timed(lambda p, x: g(p, x)[0], (params_, xx), args.iters)

    print(f"{'pair01_convblock_bf16 grad':32s} {gpair(pair_ref):8.2f} "
          f"ms/batch")
    print(f"{'pair01_s2d_bf16 grad':32s} {gpair(pair_s2d):8.2f} ms/batch")

    hbm_floor_ms = (B * (S ** 3) * (C * 2 + F * 2)) / 819e9 * 1e3
    print(f"\n# HBM floor (bf16 in+out, 819 GB/s): {hbm_floor_ms:.2f} ms; "
          f"MXU floor (27*C*F MACs, 197 Tf bf16): "
          f"{B * S**3 * 27 * C * F * 2 / 197e12 * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
