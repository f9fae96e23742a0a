"""Benchmark: end-to-end registrations/sec/chip.

One fused XLA program per registration (liftreg_tpu.pipeline): HU volume ->
attenuation -> DRR simulation (4 views, 240^2) -> backprojection lift ->
encoder + PCA expansion -> warp. This is BASELINE.json config 1; the
reference publishes no benchmark numbers, so vs_baseline is 1.0.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import signal
import sys
import time

import numpy as np

_METRIC = "fused_drr_backproj_register_throughput"
_UNIT = "registrations/sec/chip"


def _watchdog(stage, seconds):
    """Arm SIGALRM: if `stage` takes longer than `seconds` (e.g. jax init
    hanging on a dead device tunnel), print a JSON error line and exit 1
    fast instead of burning the driver's whole timeout (round-1 failure
    mode: rc=124, parsed=null)."""
    def _fire(signum, frame):
        print(json.dumps({"metric": _METRIC, "value": 0.0, "unit": _UNIT,
                          "vs_baseline": 0.0,
                          "error": f"watchdog: {stage} exceeded {seconds}s"}))
        sys.stdout.flush()
        os._exit(1)

    signal.signal(signal.SIGALRM, _fire)
    signal.alarm(seconds)


def main():
    _watchdog("jax init + first compile/readback", 420)
    import jax
    import jax.numpy as jnp

    from liftreg_tpu.pipeline import RegistrationPipeline

    sz, latent = 160, 56
    # production serving config: bf16 encoder compute + bf16 PCA basis
    # (f32 accumulation). Validated: phi deviates 0.001 voxel from f32 and
    # the trained-demo TRE moves 0.0002 mm (DESIGN.md sections 2, 4).
    pipe = RegistrationPipeline((sz, sz, sz), latent_dim=latent,
                                compute_dtype=jnp.bfloat16)
    # generate the stand-in PCA basis and the volumes ON DEVICE:
    # staging them from host costs minutes when the tunnel is degraded
    keys = jax.random.split(jax.random.PRNGKey(0), 6)
    pca = {
        "vectors": (jax.random.normal(keys[0], (latent, 3 * sz ** 3),
                                      jnp.float32) * 0.01
                    ).astype(jnp.bfloat16),
        "mean": jax.random.normal(keys[1], (3 * sz ** 3,),
                                  jnp.float32) * 0.01,
    }
    params = pipe.init_params(keys[2], pca)

    # production serving batches: B=4 amortizes encoder/PCA work across the
    # per-volume warp gathers (measured 18.5 reg/s at B=1, 23.4 at B=4)
    B = 4
    shape = (B, 1, sz, sz, sz)
    source_hu = jax.random.uniform(keys[3], shape, jnp.float32, -1000.0, 0.0)
    target_hu = jax.random.uniform(keys[4], shape, jnp.float32, -1000.0, 0.0)
    seg = (jax.random.uniform(keys[5], shape) > 0.4).astype(jnp.float32)

    warped, phi = pipe.register(params, pca, source_hu, target_hu, seg, seg)
    # under the axon tunnel block_until_ready returns at dispatch; force a
    # scalar readback to time completed work
    float(jnp.sum(warped))
    # warm-up stream: the first streamed pass after compile runs ~2x slower
    # (measured 146 -> 79 ms/iter steady state) — autotuning/cache effects
    acc = 0.0
    for _ in range(10):
        warped, _ = pipe.register(params, pca, source_hu, target_hu,
                                  seg, seg)
        acc = acc + jnp.sum(warped)
    float(acc)

    # Serving throughput: enqueue a stream of registrations and sync ONCE.
    # A per-item scalar readback would add the tunnel's ~32 ms host
    # round-trip floor to every iteration (measured: a trivial jitted op
    # plus readback costs 32.5 ms), which no production serving loop pays.
    _watchdog("timed loop", 150)
    n_iter = 20
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(n_iter):
        warped, phi = pipe.register(params, pca, source_hu, target_hu,
                                    seg, seg)
        acc = acc + jnp.sum(warped)
    float(acc)  # device executes in order; this syncs the whole stream
    dt = (time.perf_counter() - t0) / n_iter
    signal.alarm(0)

    print(json.dumps({
        "metric": _METRIC,
        "value": round(B / dt, 3),
        "unit": _UNIT,
        "vs_baseline": 1.0,
    }))


if __name__ == "__main__":
    main()
