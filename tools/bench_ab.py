"""A/B benchmark for the round-3 opt-in kernels at production scale (160^3).

Measures (streamed, chunked syncs — DESIGN.md §7 sync-floor rules):
  1. serving: RegistrationPipeline.register at B=4 and B=8 —
     s2d encoder off/on, pallas PCA expand off/on
  2. training: a jitted train step at B=2 — s2d off/on

Chip-time priority when the tunnel is scarce (post-outage runbook —
`bash tools/post_recovery.sh` / `make recover` runs items 1-8 unattended;
`tools/bench_refine.py` covers items 5 and 7):
  1. `python bench.py` (validate the warm-cache number — the must-win)
  2. `python tools/bench_stage0.py` (stage-0 conv variants)
  3. this script, serving then training
  4. if s2d/pca win: flip the pipeline defaults + bench.py, RE-WARM
     .jax_cache by running bench.py, commit cache + docs.
  5. refinement cost at 160^3: time RegistrationPipeline(refine_steps=30)
     B=4 vs refine_steps=0 (expected ~+1 PCA-expand+warp fwd+bwd per
     step, DESIGN.md section 2a); record ms/step in DESIGN.
  6. real-scale refinement TRE: `tools/refine_eval.py -s
     /root/demo_out2/.../cur_task_setting.json --steps 30 --iso_spacing
     2.2 --domain projection` (the 32^3 result is -38.1%; DEMO.md).
  7. serving artifact first call: time ServingModel.load +
     first register for /tmp/flagship160.liftreg (compile vs cache-hit).
  8. 160^3 vascular demo (the big one): train configs on the
     pre-generated /root/vascular160_data (--texture vascular,
     deformation_rank 16), then refine_eval both domains — the 32^3
     controlled experiment predicts a sub-voxel refinement floor
     (DEMO.md "Texture controls the refinement floor").

Run:  python tools/bench_ab.py [--skip-train] 2>&1 | tee /tmp/ab.log
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from liftreg_tpu.pipeline import RegistrationPipeline


def serving(s2d, B, iters=10, chunks=2, pca_pallas=False):
    sz, latent = 160, 56
    pipe = RegistrationPipeline((sz, sz, sz), latent_dim=latent,
                                compute_dtype=jnp.bfloat16, s2d_encoder=s2d,
                                pca_expand_pallas=pca_pallas)
    keys = jax.random.split(jax.random.PRNGKey(0), 6)
    pca = {"vectors": (jax.random.normal(keys[0], (latent, 3 * sz ** 3),
                                         jnp.float32) * 0.01
                       ).astype(jnp.bfloat16),
           "mean": jax.random.normal(keys[1], (3 * sz ** 3,),
                                     jnp.float32) * 0.01}
    params = pipe.init_params(keys[2], pca)
    shape = (B, 1, sz, sz, sz)
    src = jax.random.uniform(keys[3], shape, jnp.float32, -1000.0, 0.0)
    tgt = jax.random.uniform(keys[4], shape, jnp.float32, -1000.0, 0.0)
    seg = (jax.random.uniform(keys[5], shape) > 0.4).astype(jnp.float32)

    t0 = time.time()
    warped, phi = pipe.register(params, pca, src, tgt, seg, seg)
    float(jnp.sum(warped))
    print(f"  compile+first: {time.time() - t0:.1f}s")
    # warm-up stream
    acc = 0.0
    for _ in range(6):
        warped, _ = pipe.register(params, pca, src, tgt, seg, seg)
        acc = acc + jnp.sum(warped)
    float(acc)
    best = 0.0
    for _ in range(chunks):
        t0 = time.perf_counter()
        acc = 0.0
        for _ in range(iters):
            warped, _ = pipe.register(params, pca, src, tgt, seg, seg)
            acc = acc + jnp.sum(warped)
        float(acc)
        dt = (time.perf_counter() - t0) / iters
        best = max(best, B / dt)
    print(f"serving s2d={s2d} B={B}: {best:.2f} reg/s/chip "
          f"({1e3 * B / best:.1f} ms/batch)")
    return best


def training(s2d, B=2, iters=5, chunks=2):
    import optax
    from liftreg_tpu.losses import get_loss
    from liftreg_tpu.models import get_model
    from liftreg_tpu.ops import drr

    sz, latent, P = 160, 56, 4
    model = get_model("subspace_backproj")(
        img_sz=(sz, sz, sz), latent_dim=latent, drr_feature_num=P,
        compute_dtype=jnp.bfloat16, warp_taps_dtype=jnp.bfloat16,
        s2d_encoder=s2d)
    loss_obj = get_loss("subspace")({"sim_class": "ncc"})
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    pca = {"vectors": (jax.random.normal(keys[0], (latent, 3 * sz ** 3))
                       * 0.01).astype(jnp.bfloat16),
           "mean": jax.random.normal(keys[1], (3 * sz ** 3,)) * 0.01}
    poses = drr.synthesize_poses(30.0, P, sz)
    res = drr.default_resolution((sz, sz, sz))
    batch = {
        "source": jax.random.uniform(keys[2], (B, 1, sz, sz, sz)),
        "target": jax.random.uniform(keys[3], (B, 1, sz, sz, sz)),
        "source_label": jnp.ones((B, 1, sz, sz, sz)),
        "target_label": jnp.ones((B, 1, sz, sz, sz)),
        "target_proj": jax.random.uniform(keys[4], (B, P) + res),
        "target_poses": jnp.tile(poses[None], (B, 1, 1)),
    }
    params = model.init(keys[5], batch, pca)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, batch, pca):
        def loss_fn(p):
            out = model.apply(p, batch, pca)
            return loss_obj(out, 0.01)["total_loss"]
        l, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, l

    t0 = time.time()
    params, opt_state, l = step(params, opt_state, batch, pca)
    float(l)
    print(f"  compile+first: {time.time() - t0:.1f}s")
    for _ in range(3):
        params, opt_state, l = step(params, opt_state, batch, pca)
    float(l)
    best = 1e9
    for _ in range(chunks):
        t0 = time.perf_counter()
        for _ in range(iters):
            params, opt_state, l = step(params, opt_state, batch, pca)
        float(l)
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    print(f"train s2d={s2d} B={B}: {best:.1f} ms/step "
          f"({B / best * 1e3:.2f} pairs/s/chip)")
    return best


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--skip-serve", action="store_true")
    a = ap.parse_args()
    print("devices:", jax.devices())
    if not a.skip_serve:
        for s2d in (False, True):
            serving(s2d, B=4)
        serving(True, B=4, pca_pallas=True)
        serving(True, B=8, pca_pallas=True)
    if not a.skip_train:
        for s2d in (False, True):
            training(s2d)
