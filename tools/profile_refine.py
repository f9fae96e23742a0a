"""Component-level timing of one refinement step at production scale.

VERDICT r3 #4: the fused refine step measured 209.7 ms (B=4, 160^3) vs a
~140 ms sum-of-its-parts estimate. This tool measures each part in
isolation on the chip so the gap is attributable before any optimization:

  * expand_pca forward, and forward+VJP (the thin-matmul basis expansion)
  * warp forward, and forward + grad-wrt-phi (the gather-law hot spot)
  * NCC forward+backward on the warped/target pair
  * displacement_reg (FD smoothness) forward+backward
  * identity-map add (the per-step phi assembly)
  * the full fused refine step (make_refiner at n_steps=1), for the total

Usage:  python tools/profile_refine.py [--batch 4] [--size 160]
        [--latent 56] [--taps bf16|f32] [--pca bf16|f32]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from tools._timing import print_calibration, timed_ms as timed  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--size", type=int, default=160)
    ap.add_argument("--latent", type=int, default=56)
    ap.add_argument("--taps", choices=("bf16", "f32"), default="bf16")
    ap.add_argument("--pca", choices=("bf16", "f32"), default="bf16")
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--fast_vjp", action="store_true",
                    help="measure the no-re-gather custom-VJP warp paths")
    args = ap.parse_args(argv)
    fv = args.fast_vjp

    import jax
    import jax.numpy as jnp

    from liftreg_tpu.coords import identity_map
    from liftreg_tpu.losses.registration import displacement_reg
    from liftreg_tpu.losses.similarity import ncc_loss
    from liftreg_tpu.models.subspace_backproj import expand_pca
    from liftreg_tpu.ops import resample
    from liftreg_tpu.refine import make_refiner

    B, sz, L = args.batch, args.size, args.latent
    taps_dtype = jnp.bfloat16 if args.taps == "bf16" else None
    pca_dtype = jnp.bfloat16 if args.pca == "bf16" else jnp.float32
    img_sz = (sz, sz, sz)
    K = 3 * sz ** 3
    # Generate everything ON DEVICE: the (L, K) basis is ~2.7 GB at 160^3
    # f32 and would take tens of minutes through the tunnel from host numpy
    # (this is exactly what timed the first run of this tool out).
    keys = jax.random.split(jax.random.PRNGKey(0), 5)
    pca = {"vectors": (jax.random.normal(keys[0], (L, K), jnp.float32)
                       * 0.01).astype(pca_dtype),
           "mean": jax.random.normal(keys[1], (K,), jnp.float32) * 0.001}
    coefs = jax.random.normal(keys[2], (B, L), jnp.float32)
    moving = jax.random.uniform(keys[3], (B, 1, sz, sz, sz), jnp.float32,
                                -1, 1)
    target = jax.random.uniform(keys[4], (B, 1, sz, sz, sz), jnp.float32,
                                -1, 1)
    jax.block_until_ready((pca, coefs, moving, target))
    idm = identity_map(img_sz)

    print(f"B={B} {sz}^3 latent={L} taps={args.taps} pca={args.pca} "
          f"fast_vjp={fv} on {jax.devices()[0]}", flush=True)
    print_calibration()
    rows = []

    def add(name, ms):
        # print each row as it lands so a timeout still leaves data
        rows.append((name, ms))
        print(f"{name:<26} {ms:9.1f} ms", flush=True)

    # 1. expand_pca
    # NOTE: every jitted fn takes its large operands EXPLICITLY — a
    # closure-captured multi-GB array becomes a compile-payload constant,
    # which broke the tunnel relay on this tool's first three runs
    # (remote_compile: Broken pipe at exactly this first compile).
    f_pca = jax.jit(lambda z, v, m: expand_pca(z, v, m, img_sz))
    add("expand_pca fwd", timed(f_pca, coefs, pca["vectors"], pca["mean"],
                                reps=args.reps))
    g_pca = jax.jit(jax.grad(lambda z, v, m: jnp.sum(
        expand_pca(z, v, m, img_sz) ** 2)))
    add("expand_pca fwd+vjp", timed(g_pca, coefs, pca["vectors"],
                                    pca["mean"], reps=args.reps))

    # 2. warp
    disp = f_pca(coefs, pca["vectors"], pca["mean"])
    phi = disp + idm[None]
    f_warp = jax.jit(lambda v, p: resample.warp_image(
        v, p, zero_boundary=True, scale_intensity=True,
        taps_dtype=taps_dtype, fast_vjp=fv))
    add("warp fwd", timed(f_warp, moving, phi, reps=args.reps))
    g_warp = jax.jit(jax.grad(lambda p, v: jnp.sum(resample.warp_image(
        v, p, zero_boundary=True, scale_intensity=True,
        taps_dtype=taps_dtype, fast_vjp=fv))))
    add("warp fwd+grad(phi)", timed(g_warp, phi, moving, reps=args.reps))

    # 3. NCC fwd+bwd on the warped volume
    warped = f_warp(moving, phi)
    g_ncc = jax.jit(jax.grad(lambda w, t: jnp.mean(
        ncc_loss(w, t, reduction="none"))))
    add("ncc fwd+grad", timed(g_ncc, warped, target, reps=args.reps))

    # 4. displacement reg fwd+bwd
    g_reg = jax.jit(jax.grad(lambda d: jnp.mean(
        displacement_reg(d, reduction="none"))))
    add("disp_reg fwd+grad", timed(g_reg, disp, reps=args.reps))

    # 5. phi assembly
    f_phi = jax.jit(lambda d, i: d + i[None])
    add("phi = disp + idm", timed(f_phi, disp, idm, reps=args.reps))

    # 6. full fused step: n_steps=1 minus n_steps=0 would need two
    # programs; instead time n_steps=1 and n_steps=3 and difference them
    # (each extra step adds exactly one scan iteration)
    t_by_steps = {}
    for n in (1, 3):
        ref = make_refiner(img_sz, sim="ncc", n_steps=n, lr=0.05,
                           reg_factor=1e-3, warp_taps_dtype=taps_dtype,
                           fast_vjp=fv)
        t_by_steps[n] = timed(ref, coefs, pca, moving, target,
                              reps=max(3, args.reps // 2))
        add(f"refine total n={n}", t_by_steps[n])
    per_step = (t_by_steps[3] - t_by_steps[1]) / 2.0
    add("refine per-step (diff)", per_step)

    parts = sum(ms for name, ms in rows
                if name in ("expand_pca fwd+vjp", "warp fwd+grad(phi)",
                            "ncc fwd+grad", "disp_reg fwd+grad",
                            "phi = disp + idm"))
    print(f"{'sum of parts':<26} {parts:9.1f} ms  "
          f"(gap to per-step: {per_step - parts:+.1f} ms)")


if __name__ == "__main__":
    main()
