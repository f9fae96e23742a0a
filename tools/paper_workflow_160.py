"""Paper workflow at production scale (160^3) on one TPU chip.

Runs the LiftReg paper's full pipeline end to end:
  stage 1  train the dense RegNet2D3D model (reference:
           models/previous/RegNet2D3D.py) on the DRR dataset;
  stage 2  build the PCA deformation basis from the trained model's
           train-split displacement fields (the reference ships no such
           script; see tools/build_pca.py);
  stage 3  train LiftRegDeformSubspaceBackproj on that learned basis
           (reference: models/LiftRegDeformSubspaceBackproj.py) and
           evaluate landmark TRE on the test split.

Measured on one v5e chip (2026-08-17, 48-case synthetic 160^3 dataset):
stage 1 = 2901 s (1 epoch, B=1), stage 2 = 504 s (explained variance
0.919 at latent 24), stage 3 = 656 s (40 epochs) + 77 s test.

Usage: python tools/paper_workflow_160.py [--data DIR] [--out DIR]
       [--size N] [--stage1_epochs N] [--stage3_epochs N] [--latent K]
       [--s2d]  (space-to-depth encoder stages, models/s2d.py)
(--size 32 against a matching synthetic dataset gives a ~2.5 min
full-chain smoke run on CPU)
"""
import argparse, json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.environ.get("JAX_PLATFORMS") == "cpu":
    # Host-side run (e.g. while the device tunnel is degraded). The env
    # var alone does not stop the axon plugin's backend init — the config
    # update is required (tests/conftest.py). CPU compiles go to the
    # CPU-only cache, never the committed TPU .jax_cache.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_REPO, "tests", ".jax_cache_cpu"))
else:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from liftreg_tpu.train import RegistrationTrainer
from liftreg_tpu.utils.settings import default_task_setting
from liftreg_tpu import pca as pca_lib
from tools.build_pca import disp_from_experiment
from liftreg_tpu.utils.tre import eval_copd_highres

_ap = argparse.ArgumentParser()
_ap.add_argument("--data", default="/root/demo_data")
_ap.add_argument("--out", default="/root/paper160")
# basis quality tracks dense-model quality: 1 epoch (~48 min on one v5e
# chip) proves the pipeline; raise for a basis good enough to beat the
# analytic one (DEMO.md "Paper workflow at production scale")
_ap.add_argument("--stage1_epochs", type=int, default=1)
_ap.add_argument("--stage3_epochs", type=int, default=40)
# production scale is 160; smaller sizes give a fast full-chain smoke run
# against a matching `make_synthetic_dataset.py --size N` dataset
_ap.add_argument("--size", type=int, default=160)
_ap.add_argument("--latent", type=int, default=24)
# space-to-depth encoder stages (models/s2d.py): same operator/params,
# MXU-friendly channel counts — applies to both the dense RegNet stage
# and the subspace stage
_ap.add_argument("--s2d", action="store_true")
# stage-1 throughput knobs: a device-resident dataset cache removes the
# per-step host->device tunnel transfer (the dominant stage-1 cost when the
# split fits next to RegNet's activations), and inverse_iters<7 cheapens
# the fixed-point inverse-flow loop when only the forward phi feeds the
# basis (VERDICT r3 #3)
_ap.add_argument("--stage1_cache", default="auto",
                 help="cache_on_device for stage 1: auto|true|false")
_ap.add_argument("--stage1_batch", type=int, default=1)
_ap.add_argument("--stage1_inverse_iters", type=int, default=7)
# no-re-gather custom-VJP warps: RegNet differentiates warps wrt traced
# images (inverse-flow + chained warp), where the scalar-scatter image
# grad beats AD's row scatters ~7x (DESIGN.md section 3a)
_ap.add_argument("--stage1_fast_vjp", action="store_true")
# stage-1 training objective: the reference's bidirectional projection
# similarity (RegNet2D3DLoss.py:31-32), or the paper-premise CT-CT image
# similarity (README.md:10-11: simulated pairs exist precisely so a
# high-quality CT-CT loss can drive training) — losses/registration.py
# RegNetImageLoss. The basis only consumes the forward field either way.
_ap.add_argument("--stage1_loss", choices=("regnet2d3d", "image"),
                 default="regnet2d3d")
# What produces the basis-building deformations. The paper's statistical
# deformation model is PCA over dense 3D-3D registrations of the training
# pairs (README.md:10-11; the shipped pca_vectors.npy is such a model) —
# classical per-pair optimization, NOT the projection-input network:
# an amortized 2D/3D model only sees 4 limited-angle views, so its fields
# can never span what the projections cannot determine (measured: 96^3
# anatomical v2 gate, stage-1 RegNet residual 0.94 at converged loss —
# RESULTS/r5_paper96b_regnet_gate.log). 'optreg' registers each training
# pair by multi-level control-grid optimization against the full target
# CT (liftreg_tpu/optreg.py) and builds PCA from those fields.
_ap.add_argument("--stage1_mode", choices=("regnet", "optreg"),
                 default="regnet")
_ap.add_argument("--optreg_batch", type=int, default=2)
_ap.add_argument("--optreg_sim", default="ncc")
_ap.add_argument("--optreg_levels", default="",
                 help="grid:steps:lr,... e.g. 10:80:0.04,20:60:0.02")
# Constant smoothness factor for stage 1 (no decay). The default decay
# schedule (0.1 -> 0.001 from epoch 10) ends basis-building training
# essentially unregularized; on self-similar texture the dense net then
# aligns intensity with folding, correspondence-wrong fields (round-5
# 96^3 diagnosis: GT-span residual 0.99 at converged sim loss from BOTH
# stage-1 losses, fields orthogonal to GT, dice stuck at identity 0.90,
# folding_count ~1950). The true deformations are smooth; a strong
# constant reg forces the only image-aligning fields to be the true ones.
_ap.add_argument("--stage1_reg", type=float, default=None,
                 help="constant reg_factor for stage 1 (disables decay)")
# supervisor-driven resilience (flapping device tunnel): resume stage 1
# from its latest periodic checkpoint instead of restarting from scratch
_ap.add_argument("--stage1_resume", action="store_true",
                 help="resume stage 1 from exp_regnet's latest checkpoint "
                      "if one exists (full state: epoch, optimizer, "
                      "schedule position)")
# basis-span gate (VERDICT r4 #1): after stage 2, measure the GT-span
# relative residual of the learned basis on the test split's gt_phi
# (tools/basis_oracle.py) and ABORT before the stage-3 spend if it
# exceeds this bound. 0 disables the gate (the residual still prints).
_ap.add_argument("--gate_residual", type=float, default=0.0)
# Gate metric support. Displacement is only observable (and only
# consumed - masked-moving warps, intra-lung landmarks) inside the lung;
# full-volume residuals bury recovery under the textureless-air region
# where ~45% of the synthetic field's energy lives and no intensity
# method can or need recover it (round-5 measurement: same optreg basis
# scores 0.797 full-volume vs 0.509 lung-masked at 96^3).
_ap.add_argument("--gate_mask", choices=("none", "lung"), default="none")
_args = _ap.parse_args()
DATA = _args.data
OUT = _args.out
SIZE = _args.size
os.makedirs(OUT, exist_ok=True)

def base_setting(exp, epochs):
    """Canonical base (liftreg_tpu.utils.settings) + this tool's knobs."""
    return default_task_setting(DATA, exp, SIZE, overrides={
        "dataset": {"max_num_for_loading": [40, 4, 4, 4]},
        "train": {
            "epoch": epochs,
            "model": {"latent_dim": _args.latent,
                      "s2d_encoder": _args.s2d},
            "save_fig_frequency": 1000,
            "log_flush_steps": 4,
        },
    })

t0 = time.time()
if _args.stage1_mode == "optreg":
    # ---- stage 1+2 fused: per-pair optimization -> PCA ----------------
    from tools.build_pca import disp_from_optreg
    levels = None
    if _args.optreg_levels:
        levels = tuple(tuple(float(x) if i == 2 else int(x)
                             for i, x in enumerate(lv.split(":")))
                       for lv in _args.optreg_levels.split(","))
    X = disp_from_optreg(DATA, phase="train", levels=levels,
                         sim=_args.optreg_sim, batch=_args.optreg_batch)
    print(f"STAGE1 optreg done {round(time.time()-t0,1)}s", flush=True)
else:
    X = None
if _args.stage1_mode == "regnet":
    # ---- stage 1: dense RegNet2D3D, 2 epochs -----------------------------
    exp_rn = os.path.join(OUT, "exp_regnet")
    os.makedirs(exp_rn, exist_ok=True)
    s1 = base_setting(exp_rn, epochs=_args.stage1_epochs)
    s1["dataset"]["dataset_class"] = "registration2d3d_projloss"
    s1["dataset"]["apply_hu_clip"] = False
    s1["train"]["model_class"] = "regnet2d3d"
    s1["train"]["loss_class"] = ("regnet_image" if _args.stage1_loss == "image"
                                 else "regnet2d3d")
    s1["train"]["model"] = {"drr_feature_num": 4, "s2d_encoder": _args.s2d,
                            "inverse_iters": _args.stage1_inverse_iters,
                            "fast_vjp": _args.stage1_fast_vjp}
    s1["train"]["optim"]["lr"] = 5e-4
    if _args.stage1_reg is not None:
        s1["train"]["loss"]["initial_reg_factor"] = _args.stage1_reg
        s1["train"]["loss"]["min_reg_factor"] = _args.stage1_reg
    _s1_ckpt = os.path.join(exp_rn, "checkpoints", "latest_checkpoint.ckpt")
    if _args.stage1_resume and os.path.exists(_s1_ckpt):
        s1["train"]["continue_train"] = True
        s1["train"]["continue_from"] = _s1_ckpt
        print(f"STAGE1 resuming from {_s1_ckpt}", flush=True)
    s1["train"]["cache_on_device"] = ("auto" if _args.stage1_cache == "auto"
                                      else _args.stage1_cache.lower() == "true")
    s1["train"]["dataloader"]["batch_size"] = _args.stage1_batch
    RegistrationTrainer(s1).run()
    with open(os.path.join(exp_rn, "cur_task_setting.json"), "w") as f:
        json.dump(s1, f)
    print(f"STAGE1 regnet done {round(time.time()-t0,1)}s", flush=True)

# ---- stage 2: PCA from the stage-1 deformations -----------------------
t1 = time.time()
if X is None:
    X = disp_from_experiment(DATA,
                             os.path.join(exp_rn, "cur_task_setting.json"),
                             phase="train")
print("fields:", X.shape, flush=True)
# PCA components cannot exceed the number of training fields
latent = min(_args.latent, X.shape[0])
vectors, mean = pca_lib.fit_pca(X, latent)
pca_dir = os.path.join(OUT, f"pca_from_{_args.stage1_mode}")
pca_lib.save_pca(pca_dir, vectors, mean)
# explained-variance curve (VERDICT r3 #3: EVR vs TRE): nested subsets of
# the fitted basis give EVR at every smaller K for free
for k in sorted({2, 4, 8, 16, latent}):
    if k <= latent:
        r = pca_lib.explained_variance_ratio(X, vectors[:k], mean)
        print(f"  EVR@K={k}: {r:.3f}", flush=True)
ratio = pca_lib.explained_variance_ratio(X, vectors, mean)
print(f"STAGE2 pca done, explained variance {ratio:.3f}, "
      f"{round(time.time()-t1,1)}s", flush=True)

# ---- basis-span oracle: can this basis express the test deformations?
# (residual r lower-bounds achievable registration error at r * |disp|;
# the round-4 3-epoch stage-1 basis scored 1.000 here and stage 3 was
# provably wasted spend — VERDICT r4 #1)
from tools.basis_oracle import main as basis_oracle_main
resid = basis_oracle_main(["--pca", pca_dir, "--data", DATA,
                           "--phase", "test", "--mask", _args.gate_mask])
print(f"ORACLE gt-span residual (test) {resid:.4f}", flush=True)
if _args.gate_residual and resid > _args.gate_residual:
    print(f"GATE: residual {resid:.4f} > {_args.gate_residual} — the basis "
          "cannot express the test deformations; skipping stage 3. "
          "Escalate stage-1 budget (epochs/loss) and re-run.", flush=True)
    sys.exit(3)

# ---- stage 3: subspace model on the learned basis --------------------
t2 = time.time()
exp_ss = os.path.join(OUT, "exp_subspace")
os.makedirs(exp_ss, exist_ok=True)
s3 = base_setting(exp_ss, epochs=_args.stage3_epochs)
s3["train"]["model"]["latent_dim"] = latent  # clamped to the basis size
s3["train"]["model"]["pca_path"] = pca_dir
s3["train"]["model"]["pca_dtype"] = "bfloat16"
s3["train"]["model"]["warp_taps_dtype"] = "bfloat16"
s3["train"]["val_frequency"] = 5
s3["train"]["save_model_frequency"] = 5
with open(os.path.join(exp_ss, "cur_task_setting.json"), "w") as f:
    json.dump(s3, f)  # refine_eval/eval_cli consume this
RegistrationTrainer(s3).run()
print(f"STAGE3 subspace done {round(time.time()-t2,1)}s", flush=True)

# ---- eval: TRE on the test split -------------------------------------
s3["train"]["mode"] = "test"
s3["train"]["test_from"] = os.path.join(exp_ss, "checkpoints",
                                        "model_best.ckpt")
s3["train"]["save_3d_img"] = True
RegistrationTrainer(s3).run()
results = eval_copd_highres(DATA, exp_ss, dim=(SIZE, SIZE, SIZE))
print("PAPER160 COMPLETE", round(time.time()-t0,1), "s total", flush=True)
