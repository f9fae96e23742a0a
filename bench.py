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
    rng = np.random.default_rng(0)
    pipe = RegistrationPipeline((sz, sz, sz), latent_dim=latent)
    pca = {
        "vectors": jnp.asarray(
            rng.normal(size=(latent, 3 * sz ** 3)).astype(np.float32) * 0.01),
        "mean": jnp.asarray(
            rng.normal(size=(3 * sz ** 3,)).astype(np.float32) * 0.01),
    }
    params = pipe.init_params(jax.random.PRNGKey(0), pca)

    B = 1
    source_hu = jnp.asarray(
        rng.uniform(-1000, 0, (B, 1, sz, sz, sz)).astype(np.float32))
    target_hu = jnp.asarray(
        rng.uniform(-1000, 0, (B, 1, sz, sz, sz)).astype(np.float32))
    seg = jnp.asarray((rng.uniform(size=(B, 1, sz, sz, sz)) > 0.4)
                      .astype(np.float32))

    warped, phi = pipe.register(params, pca, source_hu, target_hu, seg, seg)
    # under the axon tunnel block_until_ready returns at dispatch; force a
    # scalar readback to time completed work
    float(jnp.sum(warped))

    _watchdog("timed loop", 150)
    n_iter = 10
    t0 = time.perf_counter()
    for _ in range(n_iter):
        warped, phi = pipe.register(params, pca, source_hu, target_hu,
                                    seg, seg)
        float(jnp.sum(warped))
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
