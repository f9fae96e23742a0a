"""On-chip timing for the refinement tail and the AOT serving artifact.

Covers the post-outage runbook items 5 and 7 (tools/bench_ab.py docstring):

* default mode — time ``RegistrationPipeline`` at B=4 160^3 with
  ``refine_steps=0`` vs ``refine_steps=N`` (expected cost: ~N fused
  PCA-expand + warp fwd+bwd iterations on top of the amortized program;
  DESIGN.md section 2a)::

      python tools/bench_refine.py [--steps 30] [--domain image|projection]

* ``--artifact PATH`` — time ``ServingModel.load`` + the first ``register``
  call (compile vs cache-hit) + steady-state throughput for an exported
  one-file artifact (tools/export_serving.py)::

      python tools/bench_refine.py --artifact /tmp/flagship160.liftreg

Timing methodology follows bench.py: operands generated ON DEVICE (host
staging is minutes-slow on a degraded tunnel), ~10 warm-up iterations,
chunked streams synced once per chunk (per-item scalar readback pays the
tunnel's ~32 ms round-trip floor every iteration).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")


def _stream_time(fn, n_chunks=3, chunk=5):
    """Mean seconds/iteration over chunked streams, syncing once per chunk.

    ``fn()`` must return a device array; a scalar readback of the running
    sum forces completion (block_until_ready returns at dispatch under the
    axon tunnel).
    """
    import jax.numpy as jnp
    vals = []
    for _ in range(n_chunks):
        t0 = time.perf_counter()
        acc = 0.0
        for _ in range(chunk):
            acc = acc + jnp.sum(fn())
        float(acc)
        vals.append((time.perf_counter() - t0) / chunk)
    return min(vals)


def _device_inputs(keys, B, sz, n_proj, resolution):
    import jax
    import jax.numpy as jnp
    shape = (B, 1, sz, sz, sz)
    source_hu = jax.random.uniform(keys[0], shape, jnp.float32, -1000.0, 0.0)
    target_hu = jax.random.uniform(keys[1], shape, jnp.float32, -1000.0, 0.0)
    seg = (jax.random.uniform(keys[2], shape) > 0.4).astype(jnp.float32)
    target_proj = jax.random.uniform(keys[3], (B, n_proj) + tuple(resolution),
                                     jnp.float32, -1.0, 1.0)
    return source_hu, target_hu, seg, target_proj


def bench_refine(steps, domain, B, sz, latent, fast_vjp=False):
    import jax
    import jax.numpy as jnp

    from liftreg_tpu.pipeline import RegistrationPipeline

    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    pca = {
        "vectors": (jax.random.normal(keys[0], (latent, 3 * sz ** 3),
                                      jnp.float32) * 0.01
                    ).astype(jnp.bfloat16),
        "mean": jax.random.normal(keys[1], (3 * sz ** 3,),
                                  jnp.float32) * 0.01,
    }

    results = {}
    src = tgt = seg = proj = None
    for n_steps in (0, steps):
        pipe = RegistrationPipeline(
            (sz, sz, sz), latent_dim=latent, compute_dtype=jnp.bfloat16,
            refine_steps=n_steps, refine_domain=domain,
            refine_fast_vjp=fast_vjp)
        if src is None:
            src, tgt, seg, proj = _device_inputs(
                keys[2:6], B, sz, int(pipe.poses.shape[0]), pipe.resolution)
        params = pipe.init_params(keys[6], pca)
        if domain == "projection":
            call = lambda: pipe.register_projections(  # noqa: E731
                params, pca, src, proj, seg)[0]
        else:
            call = lambda: pipe.register(  # noqa: E731
                params, pca, src, tgt, seg, seg)[0]
        t0 = time.perf_counter()
        float(jnp.sum(call()))
        compile_s = time.perf_counter() - t0
        # warm-up stream (first streamed pass after compile is ~2x slower)
        acc = 0.0
        for _ in range(10):
            acc = acc + jnp.sum(call())
        float(acc)
        dt = _stream_time(call)
        results[n_steps] = (compile_s, dt)
        print(f"refine_steps={n_steps:3d} domain={domain} "
              f"fast_vjp={fast_vjp}: "
              f"compile {compile_s:6.1f}s, {dt * 1e3:8.1f} ms/call "
              f"(B={B}, {B / dt:.2f} reg/s)")
    d0, dN = results[0][1], results[steps][1]
    if steps:
        print(f"refinement tail: +{(dN - d0) * 1e3:.1f} ms/call "
              f"({(dN - d0) * 1e3 / steps:.2f} ms/step over {steps} steps)")


def bench_artifact(path, n_chunks=3, chunk=5):
    import jax
    import jax.numpy as jnp

    from liftreg_tpu.serving import ServingModel

    t0 = time.perf_counter()
    model = ServingModel.load(path)
    load_s = time.perf_counter() - t0
    meta = model.meta
    B = int(meta["batch_size"])
    sz = int(meta["img_sz"][0])
    print(f"load: {load_s:.1f}s  (batch_size={B}, img_sz={meta['img_sz']}, "
          f"entry={model.entry})")

    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    res = tuple(meta.get("resolution", (240, 240)))
    n_proj = int(meta.get("n_proj", 4))
    src, tgt, seg, proj = _device_inputs(keys, B, sz, n_proj, res)

    src_n, tgt_n, seg_n = (jax.device_get(x) for x in (src, tgt, seg))
    if model.entry == "register_projections":
        proj_n = jax.device_get(proj)
        def call():
            return jnp.asarray(
                model.register_projections(src_n, proj_n, seg_n)[0])
    else:
        def call():
            return jnp.asarray(model.register(src_n, tgt_n, seg_n, seg_n)[0])

    t0 = time.perf_counter()
    float(jnp.sum(call()))
    first_s = time.perf_counter() - t0
    print(f"first {model.entry}: {first_s:.1f}s (compile or cache-hit + "
          f"host staging)")

    acc = 0.0
    for _ in range(5):
        acc = acc + jnp.sum(call())
    float(acc)
    dt = _stream_time(call, n_chunks=n_chunks, chunk=chunk)
    print(f"steady state: {dt * 1e3:.1f} ms/call (B={B}, "
          f"{B / dt:.2f} reg/s) — includes host->device staging per call")


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--domain", choices=("image", "projection"),
                    default="image")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--size", type=int, default=160)
    ap.add_argument("--latent", type=int, default=56)
    ap.add_argument("--fast_vjp", action="store_true",
                    help="refine through the no-re-gather custom-VJP warp")
    ap.add_argument("--artifact", default=None,
                    help="path to a .liftreg artifact: time load + first "
                         "call instead of the refine comparison")
    args = ap.parse_args()

    import jax
    # persistent cache only on the TPU: the committed .jax_cache holds
    # TPU-host entries; loading them from a CPU run trips XLA's AOT
    # machine-feature mismatch (SIGILL risk) and pollutes the curated set
    if jax.default_backend() == "tpu":
        jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    if args.artifact:
        bench_artifact(args.artifact)
    else:
        bench_refine(args.steps, args.domain, args.batch, args.size,
                     args.latent, fast_vjp=args.fast_vjp)


if __name__ == "__main__":
    main()
