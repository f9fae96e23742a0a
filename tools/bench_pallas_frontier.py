"""Settle the Pallas question at the shapes where XLA's lowering was
weakest (VERDICT r3 #8):

  1. PCA expansion (Pallas streamed vs XLA dot) at latent 56 / 128 / 256,
     160^3, B=4 — larger latents stream proportionally more basis bytes,
     the regime the streaming kernel was built for.
  2. Backprojection (Pallas vs XLA scan) at 192^3 (BASELINE config 4's
     resolution-scaling shape) and 160^3 for reference.
  3. Forward projection (Pallas vs XLA scan) at the same shapes.

Prints a decision table; flip the pipeline defaults where a kernel wins,
or record "XLA owns these ops at all relevant shapes" in DESIGN.md §1.
"""
from __future__ import annotations

import argparse
import os
import sys
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from tools._timing import print_calibration, timed_ms as timed  # noqa: E402


def bench_pca(B=4, sz=160, latents=(56, 128, 256), reps=10):
    import jax
    import jax.numpy as jnp

    from liftreg_tpu.models.subspace_backproj import expand_pca
    from liftreg_tpu.ops.pallas_pca import expand_pca_streamed

    # All inputs are generated ON DEVICE: an L=256 bf16 basis is 6.3 GB,
    # which through the host tunnel takes tens of minutes and broke the
    # transport on the first run of this tool (rc=1, broken pipe).
    K = 3 * sz ** 3
    rows = []
    for L in latents:
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(L), 3)
        V = (jax.random.normal(k1, (L, K), jnp.bfloat16) * 0.01)
        mean = jax.random.normal(k2, (K,), jnp.float32) * 0.001
        z = jax.random.normal(k3, (B, L), jnp.float32)
        jax.block_until_ready((V, mean, z))
        gb = V.nbytes / 2 ** 30
        # explicit operands: a closure/default-arg-captured multi-GB
        # basis becomes a compile-payload constant and breaks the tunnel
        # relay (remote_compile: Broken pipe — first two runs of this tool)
        xla = jax.jit(lambda z, V, mean: jnp.dot(
            z.astype(jnp.bfloat16), V,
            preferred_element_type=jnp.float32) + mean)
        pal = jax.jit(lambda z, V, mean: expand_pca_streamed(z, V, mean))
        t_x = timed(xla, z, V, mean, reps=reps)
        t_p = timed(pal, z, V, mean, reps=reps)
        floor = gb / 0.80  # ~819 GB/s HBM -> ms per GB ~ 1.25; 0.80 GB/ms
        rows.append((f"pca L={L} ({gb:.2f} GB basis)", t_x, t_p, floor))
        del V
    return rows


def bench_drr(B=1, sizes=(160, 192), n_proj=4, reps=10):
    import jax
    import jax.numpy as jnp

    from liftreg_tpu.ops import drr
    from liftreg_tpu.ops.pallas_drr import (backproject_with_mats_pallas,
                                            project_with_mats_pallas)

    rows = []
    for sz in sizes:
        shape = (sz, sz, sz)
        res = drr.default_resolution(shape)
        poses = drr.synthesize_poses(30.0, n_proj, sz)
        spacing = (2.2, 2.2, 2.2)
        k1, k2 = jax.random.split(jax.random.PRNGKey(sz))
        vol = jax.random.uniform(k1, (B,) + shape, jnp.float32, 0, 0.2)
        Rx, Rz, dx = drr.forward_matrices(poses, shape, res, spacing)
        proj = jax.random.uniform(k2, (B, n_proj) + res, jnp.float32, 0, 6)
        jax.block_until_ready((vol, proj))
        Bu, Bv = drr.backward_matrices(poses, shape, res)

        f_x = jax.jit(lambda v: drr.project_with_mats(v, Rx, Rz, dx))
        f_p = jax.jit(lambda v: project_with_mats_pallas(v, Rx, Rz, dx))
        rows.append((f"project {sz}^3", timed(f_x, vol, reps=reps),
                     timed(f_p, vol, reps=reps), None))

        b_x = jax.jit(lambda p: drr.backproject_with_mats(p, Bu, Bv))
        b_p = jax.jit(lambda p: backproject_with_mats_pallas(p, Bu, Bv))
        # correctness cross-check while we're here
        np.testing.assert_allclose(np.asarray(b_x(proj)),
                                   np.asarray(b_p(proj)), rtol=2e-2,
                                   atol=2e-3)
        rows.append((f"backproject {sz}^3", timed(b_x, proj, reps=reps),
                     timed(b_p, proj, reps=reps), None))
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--skip_drr", action="store_true")
    ap.add_argument("--skip_pca", action="store_true")
    args = ap.parse_args(argv)

    import jax
    print(f"device: {jax.devices()[0]}")
    print_calibration()
    rows = []
    if not args.skip_pca:
        rows += bench_pca(reps=args.reps)
    if not args.skip_drr:
        rows += bench_drr(reps=args.reps)

    print(f"\n{'op':<28} {'XLA ms':>9} {'Pallas ms':>10} {'winner':>8}"
          f" {'HBM floor':>10}")
    for name, t_x, t_p, floor in rows:
        win = "pallas" if t_p < t_x else "XLA"
        fl = f"{floor:8.1f}" if floor else "      --"
        print(f"{name:<28} {t_x:9.2f} {t_p:10.2f} {win:>8} {fl:>10}")


if __name__ == "__main__":
    main()
