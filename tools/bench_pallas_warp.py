"""On-chip A/B: Pallas locality warp vs the XLA oct/quad gather paths.

Measures at the serving shape (B=4, 160^3) with realistic smooth fields
(large z motion, small y/x — generated ON DEVICE; host staging of
multi-GB operands has broken the tunnel transport before):

  * resample oct bf16 (the shipped serving path, gather-law bound)
  * resample quad f32 (the exact path)
  * pallas_warp.warp_plane_gather at dy/dx windows 4/6/8, bf16 + f32 taps
  * a worst-case field using the full window everywhere (no skip benefit)

plus a device-side max-abs-err cross-check per variant. Decision data
for DESIGN.md section 3 / the VERDICT "Pallas question".

Usage: python tools/bench_pallas_warp.py [--batch 4] [--size 160]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools._timing import print_calibration, timed_ms  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--size", type=int, default=160)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--windows", type=int, nargs="+", default=[4, 6, 8])
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from liftreg_tpu.ops import pallas_warp, resample

    B, sz = args.batch, args.size
    print(f"B={B} {sz}^3 on {jax.devices()[0]}", flush=True)
    print_calibration()

    def timed(fn, *xs, reps=args.reps):
        return timed_ms(fn, *xs, reps=reps, warmup=1)

    # on-device inputs: volume + smooth field (z ~ +/-10 vox, y/x ~ +/-4)
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    vol = jax.random.uniform(keys[0], (B, 1, sz, sz, sz), jnp.float32, -1, 1)

    @jax.jit
    def make_field(key, scale_z, scale_yx):
        g = jax.random.normal(key, (B, 3, 8, 8, 8), jnp.float32)
        up = jax.image.resize(g, (B, 3, sz, sz, sz), "cubic")
        up = up / jnp.max(jnp.abs(up), axis=(2, 3, 4), keepdims=True)
        scales = jnp.asarray([scale_z, scale_yx, scale_yx])
        disp = up * scales[None, :, None, None, None]
        ax = jnp.arange(sz, dtype=jnp.float32)
        ident = jnp.stack(jnp.meshgrid(ax, ax, ax, indexing="ij"))
        return jnp.moveaxis(ident[None] + disp, 1, -1)

    px = make_field(keys[1], 10.0, 4.0)
    dyw, dxw = pallas_warp.displacement_window(px)
    print(f"field window: dy={float(dyw):.0f} dx={float(dxw):.0f}",
          flush=True)

    rows = []

    def add(name, ms, err=None):
        rows.append((name, ms))
        e = "" if err is None else f"  maxerr={err:.2e}"
        print(f"{name:<40} {ms:9.2f} ms/batch{e}", flush=True)

    f_oct = jax.jit(lambda v, p: resample._trilinear_oct_bf16(v, p, "zeros"))
    ref = f_oct(vol, px)
    add("oct bf16 (shipped serving path)", timed(f_oct, vol, px))
    f_quad = jax.jit(lambda v, p: resample._trilinear_quad(v, p, "zeros"))
    ref_f32 = f_quad(vol, px)
    add("quad f32 (exact path)", timed(f_quad, vol, px))

    for w in args.windows:
        for taps, taps_ref in ((jnp.bfloat16, ref), (jnp.float32, ref_f32)):
            tname = "bf16" if taps == jnp.bfloat16 else "f32"
            f_pw = jax.jit(lambda v, p, w=w, taps=taps:
                           pallas_warp.warp_plane_gather(
                               v, p, padding="zeros", dy_max=w, dx_max=w,
                               taps_dtype=taps))
            try:
                out = f_pw(vol, px)
                err = float(jnp.max(jnp.abs(out - taps_ref)))
                add(f"pallas window={w} taps={tname}",
                    timed(f_pw, vol, px), err)
            except Exception as e:  # noqa: BLE001 - report lowering failures
                print(f"pallas window={w} taps={tname} FAILED: "
                      f"{type(e).__name__}: {str(e).splitlines()[0][:90]}",
                      flush=True)

    # worst case: displacements at the full window everywhere (no skip)
    w = args.windows[-1]
    px_worst = make_field(keys[2], float(w), float(w))
    f_pw = jax.jit(lambda v, p: pallas_warp.warp_plane_gather(
        v, p, padding="zeros", dy_max=w, dx_max=w,
        taps_dtype=jnp.bfloat16))
    try:
        out = f_pw(vol, px_worst)
        err = float(jnp.max(jnp.abs(
            out - f_oct(vol, px_worst))))
        add(f"pallas window={w} WORST-case field",
            timed(f_pw, vol, px_worst), err)
    except Exception as e:  # noqa: BLE001
        print(f"pallas worst-case FAILED: {type(e).__name__}", flush=True)

    base = rows[0][1]
    for name, ms in rows[2:]:
        print(f"{name:<40} speedup vs oct: {base / ms:5.2f}x", flush=True)


if __name__ == "__main__":
    main()
