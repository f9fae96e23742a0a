"""Evaluate instance refinement on a trained experiment's test split.

Runs the trained model over the test split twice — amortized prediction
(the reference's entire story, ``eval.py:35-49``) and prediction + N steps
of per-case latent refinement (``liftreg_tpu/refine.py``) — writes both
sets of deformations, scores both with the DirLab TRE evaluator, and
prints the comparison::

    python tools/refine_eval.py -s <exp>/cur_task_setting.json \
        --steps 30 --lr 0.05

Refined phis + ``evaluate_result.csv`` land in ``<exp>/refined/tests``.
``--iso_spacing`` supplies a uniform landmark spacing for synthetic
datasets (real DirLab cases use the built-in COPD table).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("-s", "--setting_path", required=True)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--lr", type=float, default=0.05)
    ap.add_argument("--reg_factor", type=float, default=None,
                    help="smoothness weight (default: the config's "
                         "min_reg_factor)")
    ap.add_argument("--iso_spacing", type=float, default=0.0,
                    help="uniform landmark spacing (mm) for synthetic data")
    ap.add_argument("--domain", choices=("image", "projection"),
                    default="image",
                    help="refinement objective: 'image' = sim vs target "
                         "CT (training's SubspaceLoss; needs the target "
                         "volume); 'projection' = sim(DRR(warped "
                         "attenuation), measured projections) — the "
                         "CT-free deployment scenario")
    args = ap.parse_args()

    import numpy as np

    from liftreg_tpu.models.subspace_backproj import mask_lung
    from liftreg_tpu.refine import make_projection_refiner, make_refiner
    from liftreg_tpu.train import RegistrationTrainer
    from liftreg_tpu.utils.config import ParameterDict
    from liftreg_tpu.utils.io_utils import save_deformations
    from liftreg_tpu.utils.tre import eval_copd_highres

    setting = ParameterDict()
    setting.load_JSON(args.setting_path)
    setting["train"]["mode"] = "test"
    setting["train"]["test_from"] = os.path.join(
        setting["train"]["output_path"], "checkpoints", "model_best.ckpt")
    setting["train"]["save_fig"] = False
    setting["train"]["save_3d_img"] = True

    trainer = RegistrationTrainer(setting)
    loss_cfg = setting["train"]["loss"]
    loss_cfg = loss_cfg.as_dict() \
        if hasattr(loss_cfg, "as_dict") else dict(loss_cfg)
    reg_factor = args.reg_factor if args.reg_factor is not None \
        else float(loss_cfg.get("min_reg_factor", 1e-3))
    sim_kw = dict(sim=loss_cfg.get("sim_class", "ncc"),
                  sim_opts=loss_cfg.get("sim_opts", None),
                  n_steps=args.steps, lr=args.lr, reg_factor=reg_factor)
    refiner = None  # projection refiner needs the dataset's poses (batch 1)
    if args.domain == "image":
        refiner = make_refiner(
            trainer.img_sz, warp_taps_dtype=trainer.model.warp_taps_dtype,
            mesh=trainer.model.mesh, **sim_kw)

    ds_cfg = setting["dataset"]
    ds_cfg = ds_cfg.as_dict() if hasattr(ds_cfg, "as_dict") else dict(ds_cfg)

    exp = setting["train"]["output_path"]
    base_tests = os.path.join(exp, "tests")
    refined_exp = os.path.join(
        exp, "refined" if args.domain == "image" else "refined_proj")
    refined_tests = os.path.join(refined_exp, "tests")
    os.makedirs(refined_tests, exist_ok=True)

    all_names, sim_drops = [], []
    for data in trainer.loaders["test"]:
        batch, names = trainer.set_input(data, 0)
        eval_out, out = trainer._eval_step(trainer.params, batch,
                                           trainer.pca)
        nv = len(names)
        # amortized phis (what eval_cli scores)
        save_deformations(np.asarray(eval_out["phi"])[:nv], names,
                          base_tests)
        if args.domain == "projection":
            if refiner is None:
                from liftreg_tpu.refine import _VOLUME_ONLY_SIMS
                proj_sim_kw = dict(sim_kw)
                if proj_sim_kw["sim"] in _VOLUME_ONLY_SIMS:
                    # e.g. an LNCC experiment: its 3D windowed sim cannot
                    # score 2D projections — fall back to NCC loudly
                    print(f"note: sim_class {proj_sim_kw['sim']!r} is "
                          f"3D-only; projection-domain refinement uses "
                          f"'ncc' instead")
                    proj_sim_kw.update(sim="ncc", sim_opts=None)
                poses = np.asarray(batch["target_poses"])
                poses = poses[0] if poses.ndim == 3 else poses
                refiner = make_projection_refiner(
                    trainer.img_sz, poses,
                    tuple(batch["target_proj"].shape[-2:]),
                    tuple(ds_cfg.get("spacing_to_refer", (2.2, 2.2, 2.2))),
                    **proj_sim_kw)
            # dataset 'source' is normalized HU [-1,1]; invert to HU then
            # to linear attenuation (normalize_hu: clip/1000*2+1)
            hu = (np.asarray(batch["source"]) - 1.0) * 500.0
            from liftreg_tpu.ops import drr as _drr
            moving_atten = _drr.calc_relative_atten_coef(hu)
            res = refiner(out["pca_coefs"], trainer.pca, moving_atten,
                          batch["target_proj"])
        else:
            if trainer.model.mask_ct and "source_label" in batch:
                moving_cp = mask_lung(batch["source"],
                                      batch["source_label"])
            else:
                moving_cp = batch["source"]
            res = refiner(out["pca_coefs"], trainer.pca, moving_cp,
                          out["target"])
        save_deformations(np.asarray(res["phi"])[:nv], names, refined_tests)
        hist = np.asarray(res["sim_history"])
        sim_drops.append((float(hist[0]), float(hist[-1])))
        all_names.extend(names)
        print(f"{names}: sim {hist[0]:.4f} -> {hist[-1]:.4f} "
              f"({args.steps} steps)")

    data_path = ds_cfg["data_path"]
    dim = tuple(ds_cfg.get("img_after_resize", (160, 160, 160)))
    table = {str(n): [args.iso_spacing] * 3 for n in all_names} \
        if args.iso_spacing else None

    if sim_drops:
        d0 = float(np.mean([a for a, _ in sim_drops]))
        d1 = float(np.mean([b for _, b in sim_drops]))
        print(f"\nmean sim loss over test batches: {d0:.4f} -> {d1:.4f}")

    print("\n== amortized prediction ==")
    base = eval_copd_highres(data_path, exp, spacing_table=table, dim=dim)
    print(f"\n== refined ({args.steps} steps, lr {args.lr}, "
          f"reg {reg_factor}) ==")
    refined = eval_copd_highres(data_path, refined_exp, spacing_table=table,
                                dim=dim)
    if base and refined:
        b = float(np.mean([r["dist"] for r in base]))
        r = float(np.mean([r["dist"] for r in refined]))
        print(f"\nmean TRE: {b:.4f} mm amortized -> {r:.4f} mm refined "
              f"({100.0 * (b - r) / max(b, 1e-12):+.1f}%)")


if __name__ == "__main__":
    main()
