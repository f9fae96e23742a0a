"""Guard the committed compile cache: hash the driver-facing program traces.

The driver's bench and compile-check rely on the committed ``.jax_cache/``
to turn the ~3-6 min cold 160^3 compile into a ~22 s deserialization
(DESIGN.md section 7). The cache key is derived from the traced program, so
ANY commit that changes the flagship's traced HLO silently invalidates the
warm cache — and the driver then pays a cold compile inside its watchdog
budget, which is the exact failure mode of BENCH_r01/r02.

This tool lowers the two driver-facing programs on CPU (abstract args — no
compute, no device needed) and prints a stable SHA-256 of their StableHLO:

* ``bench``: ``RegistrationPipeline.register`` exactly as ``bench.py``
  builds it (160^3, latent 56, B=4, bf16 compute);
* ``entry``: the f32 ``LiftRegSubspaceBackproj.apply`` that
  ``__graft_entry__.entry()`` hands the driver.

Usage::

    python tools/check_cache_trace.py            # print current hashes
    python tools/check_cache_trace.py --check    # compare vs TRACE_HASHES

``--check`` exits nonzero when a hash drifted from the recorded values —
meaning: re-warm the cache on the real chip (``make bench``) and update
``TRACE_HASHES`` below, or revert the trace change.

CPU StableHLO is a valid proxy for the TPU cache key: platform-specific
lowering happens AFTER this representation, so byte-identical StableHLO
(holding jax version and compile flags fixed) implies an identical TPU
cache key. Verified 2026-08-18: hashes byte-identical between the
cache-warm commit (0ee3112) and HEAD across 10 intervening
trace-adjacent commits.
"""
import argparse
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# In-process platform selection: the axon sitecustomize registers the TPU
# plugin at interpreter start, which defeats JAX_PLATFORMS env selection
# and hangs on a dead relay (DESIGN.md section 7).
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from liftreg_tpu.models import LiftRegSubspaceBackproj  # noqa: E402
from liftreg_tpu.ops import drr  # noqa: E402
from liftreg_tpu.pipeline import RegistrationPipeline  # noqa: E402

# Recorded hashes for the committed .jax_cache (update after re-warming).
TRACE_HASHES = {
    "bench": "5234859ae938b8287dfde9a7d1637e06e28702124bce424a5f5c8a929c553116",
    "entry": "772b84e3da1ea50458de881d67ce428df7d42516f4a0ad714c8564a105bd0a01",
}


def _sds_inputs(sz, n_proj, res, poses_shape, B):
    sds = jax.ShapeDtypeStruct
    return {
        "source": sds((B, 1, sz, sz, sz), jnp.float32),
        "target": sds((B, 1, sz, sz, sz), jnp.float32),
        "source_label": sds((B, 1, sz, sz, sz), jnp.float32),
        "target_label": sds((B, 1, sz, sz, sz), jnp.float32),
        "target_proj": sds((B, n_proj) + res, jnp.float32),
        "target_poses": sds((B,) + poses_shape, jnp.float32),
        "spacing": sds((B, 3), jnp.float32),
    }


def bench_trace_hash(sz=160, latent=56, B=4):
    """StableHLO hash of the program bench.py compiles."""
    sds = jax.ShapeDtypeStruct
    pipe = RegistrationPipeline((sz, sz, sz), latent_dim=latent,
                                compute_dtype=jnp.bfloat16)
    pca = {"vectors": sds((latent, 3 * sz ** 3), jnp.bfloat16),
           "mean": sds((3 * sz ** 3,), jnp.float32)}
    vol = sds((B, 1, sz, sz, sz), jnp.float32)
    dummy = _sds_inputs(sz, pipe.poses.shape[0], pipe.resolution,
                        pipe.poses.shape, B=1)
    params = jax.eval_shape(pipe.model.init, jax.random.PRNGKey(0),
                            dummy, pca)
    text = pipe._register.lower(params, pca, vol, vol, vol, vol).as_text()
    return hashlib.sha256(text.encode()).hexdigest()


def entry_trace_hash(sz=160, latent=56):
    """StableHLO hash of the program __graft_entry__.entry() exposes."""
    sds = jax.ShapeDtypeStruct
    model = LiftRegSubspaceBackproj(img_sz=(sz, sz, sz), latent_dim=latent)
    poses = drr.synthesize_poses(30.0, 4, sz)
    res = drr.default_resolution((sz, sz, sz))
    inputs = _sds_inputs(sz, 4, res, poses.shape, B=1)
    pca = {"vectors": sds((latent, 3 * sz ** 3), jnp.float32),
           "mean": sds((3 * sz ** 3,), jnp.float32)}
    params = jax.eval_shape(model.init, jax.random.PRNGKey(0), inputs, pca)
    text = jax.jit(model.apply).lower(params, inputs, pca).as_text()
    return hashlib.sha256(text.encode()).hexdigest()


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--check", action="store_true",
                    help="exit 1 if a hash drifted from TRACE_HASHES")
    args = ap.parse_args()

    current = {"bench": bench_trace_hash(), "entry": entry_trace_hash()}
    drifted = []
    for name, h in current.items():
        status = ""
        if args.check:
            ok = h == TRACE_HASHES[name]
            status = "  OK" if ok else "  DRIFTED (cache cold for driver!)"
            if not ok:
                drifted.append(name)
        print(f"{name}: {h}{status}")
    if drifted:
        print(f"\nTrace drift in: {', '.join(drifted)}. Re-warm the cache "
              f"on the real chip (make bench) and update TRACE_HASHES, or "
              f"revert the trace change.", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
