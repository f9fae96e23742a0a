"""Export a trained experiment as a one-file AOT serving artifact.

Packages the fused registration program (StableHLO via ``jax.export``,
lowered for TPU + CPU) together with the trained weights and PCA basis —
see ``liftreg_tpu/serving.py``. The serving host needs only
``ServingModel.load``; no config, checkpoint, or model source.

From a trained experiment (the reference's deployment unit is the whole
experiment directory + code checkout; ours is this one file)::

    python tools/export_serving.py -s exp/cur_task_setting.json \
        -o flagship.liftreg -b 4

Synthetic smoke test (no experiment needed)::

    python tools/export_serving.py --demo 32 -o demo.liftreg
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("-s", "--setting_path", type=str, default="",
                    help="experiment cur_task_setting.json")
    ap.add_argument("-o", "--out", type=str, required=True,
                    help="output artifact path (e.g. flagship.liftreg)")
    ap.add_argument("-b", "--batch_size", type=int, default=4,
                    help="serving batch the program is specialized to")
    ap.add_argument("--checkpoint", type=str, default="",
                    help="checkpoint to export (default: the experiment's "
                         "model_best.ckpt)")
    ap.add_argument("--platforms", type=str, default="tpu,cpu",
                    help="comma-separated export platforms")
    ap.add_argument("--demo", type=int, default=0, metavar="SZ",
                    help="export a randomly-initialized SZ^3 model instead "
                         "of a trained experiment (smoke testing)")
    ap.add_argument("--refine_steps", type=int, default=0,
                    help="bake N steps of per-case latent refinement into "
                         "the exported program (refine.py)")
    ap.add_argument("--refine_lr", type=float, default=0.05)
    ap.add_argument("--format", type=int, choices=(1, 2), default=2,
                    help="artifact format: 2 = zero-copy mmap sections "
                         "(default), 1 = legacy single msgpack blob")
    ap.add_argument("--entry", choices=("register", "projections"),
                    default="register",
                    help="'projections' exports the CT-free entry "
                         "(moving CT + measured 2D projections in, no "
                         "target volume); refinement then runs in the "
                         "projection domain")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import serialization

    from liftreg_tpu.pipeline import RegistrationPipeline
    from liftreg_tpu.serving import export_serving

    platforms = tuple(p.strip() for p in args.platforms.split(",") if p.strip())

    entry = "register" if args.entry == "register" \
        else "register_projections"
    refine_kw = dict(refine_steps=args.refine_steps,
                     refine_lr=args.refine_lr)
    if args.refine_steps and entry == "register_projections":
        # the CT-free entry can only refine against the projections
        refine_kw["refine_domain"] = "projection"

    if args.demo:
        sz, latent = int(args.demo), 8
        pipe = RegistrationPipeline((sz, sz, sz), latent_dim=latent,
                                    **refine_kw)
        keys = jax.random.split(jax.random.PRNGKey(0), 3)
        pca = {"vectors": jax.random.normal(
                   keys[0], (latent, 3 * sz ** 3), jnp.float32) * 0.01,
               "mean": jax.random.normal(
                   keys[1], (3 * sz ** 3,), jnp.float32) * 0.01}
        params = pipe.init_params(keys[2], pca)
    else:
        if not args.setting_path:
            ap.error("either --setting_path or --demo is required")
        from liftreg_tpu.train.trainer import load_pca
        from liftreg_tpu.utils.checkpoint import load_checkpoint
        from liftreg_tpu.utils.config import ParameterDict

        setting = ParameterDict()
        setting.load_JSON(args.setting_path)
        train_setting = setting["train"]
        model_cfg = train_setting["model"]
        model_cfg = model_cfg.as_dict() \
            if hasattr(model_cfg, "as_dict") else dict(model_cfg)
        ds_cfg = setting["dataset"]
        ds_cfg = ds_cfg.as_dict() \
            if hasattr(ds_cfg, "as_dict") else dict(ds_cfg)
        img_sz = tuple(ds_cfg.get("img_after_resize", (160, 160, 160)))

        if args.refine_steps:
            # refinement continues the TRAINING objective: take the sim
            # and converged reg factor from the experiment's loss config
            loss_cfg = train_setting["loss"]
            loss_cfg = loss_cfg.as_dict() \
                if hasattr(loss_cfg, "as_dict") else dict(loss_cfg)
            refine_kw.update(
                refine_sim=loss_cfg.get("sim_class", "ncc"),
                refine_sim_opts=loss_cfg.get("sim_opts", None),
                refine_reg_factor=float(loss_cfg.get("min_reg_factor",
                                                     1e-3)))

        from liftreg_tpu.utils.general import parse_bool

        bf16 = jnp.bfloat16
        compute_dtype = bf16 \
            if model_cfg.get("compute_dtype") == "bfloat16" else None
        # match the trainer's model EXACTLY (trainer.py:202-216): the
        # trainer uses f32-exact taps unless warp_taps_dtype is explicitly
        # "bfloat16" — the pipeline's own compute_dtype->taps default
        # would silently serve a different warp than the trained model
        warp_taps = bf16 \
            if model_cfg.get("warp_taps_dtype") == "bfloat16" else None
        pipe = RegistrationPipeline(
            img_sz,
            latent_dim=int(model_cfg.get("latent_dim", 56)),
            n_proj=int(model_cfg.get("drr_feature_num", 4)),
            compute_dtype=compute_dtype,
            warp_taps_dtype=warp_taps,
            mask_ct=parse_bool(model_cfg.get("mask_ct"), default=True),
            s2d_encoder=parse_bool(model_cfg.get("s2d_encoder"),
                                   default=False), **refine_kw)

        pca = load_pca(model_cfg["pca_path"],
                       dtype=bf16 if model_cfg.get("pca_dtype") == "bfloat16"
                       else None)

        ckpt = args.checkpoint or os.path.join(
            train_setting["output_path"], "checkpoints", "model_best.ckpt")
        state = load_checkpoint(ckpt)
        # abstract template: tree structure only, no 160^3 forward on the
        # export host
        sds = jax.ShapeDtypeStruct
        sz = img_sz
        dummy = {
            "source": sds((1, 1) + sz, jnp.float32),
            "target": sds((1, 1) + sz, jnp.float32),
            "source_label": sds((1, 1) + sz, jnp.float32),
            "target_label": sds((1, 1) + sz, jnp.float32),
            "target_proj": sds((1, pipe.poses.shape[0]) + pipe.resolution,
                               jnp.float32),
            "target_poses": sds((1,) + pipe.poses.shape, jnp.float32),
            "spacing": sds((1, 3), jnp.float32),
        }
        template = jax.eval_shape(
            pipe.model.init, jax.random.PRNGKey(0), dummy,
            jax.tree_util.tree_map(
                lambda x: sds(x.shape, x.dtype), pca))
        params = serialization.from_state_dict(template, state["params"])
        print(f"loaded checkpoint '{ckpt}' "
              f"(epoch {int(state.get('epoch', -1))})")

    out = export_serving(pipe, params, pca, batch_size=args.batch_size,
                         out_path=args.out, platforms=platforms,
                         entry=entry, artifact_format=args.format)
    print(f"wrote {out} ({os.path.getsize(out) / 1e6:.1f} MB, "
          f"platforms={list(platforms)}, batch_size={args.batch_size}, "
          f"entry={entry})")


if __name__ == "__main__":
    main()
