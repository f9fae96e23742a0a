"""One-command DirLab dress rehearsal: raw ``.img`` -> ``evaluate_result.csv``.

Chains the full production pipeline (the reference's four separate manual
steps, ``tools/preprocessing.py`` -> ``tools/preprocessingDRR.py`` ->
``main.py`` -> ``eval.py``) into a single CLI:

1. preprocess raw DirLab-format volumes (resample to iso spacing, body strip,
   lung masks, center pad/crop) and write train/val + test id lists;
2. copy the DirLab landmark files into the dataset layout;
3. generate limited-angle DRRs + shared poses;
4. obtain a PCA deformation basis (``--pca_path`` for a real basis — e.g.
   built by ``tools/build_pca.py --from_experiment`` from a trained dense
   model — else a smooth random placeholder basis so the chain still runs);
5. train the subspace model for ``--epochs``;
6. test the best checkpoint, save deformations, and run the landmark TRE
   evaluation -> ``<exp>/evaluate_result.csv``.

Real-data usage (10 COPD cases + landmark txts):

    python tools/dirlab_e2e.py --raw_path /data/copd_raw \
        --landmarks /data/copd_landmarks --out /data/liftreg_run \
        --pca_path /data/pca --epochs 300

Smoke-tested end to end from raw int16 bytes by
``tests/test_dirlab_e2e.py``.
"""
from __future__ import annotations

import argparse
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from liftreg_tpu.utils.settings import default_task_setting           # noqa: E402
from tools.preprocessing import FILE_TYPE, preprocess, save_id_list  # noqa: E402
from tools.preprocessing_drr import generate_drrs                    # noqa: E402


def build_setting(data_path, exp_path, size, latent, n_proj, epochs,
                  batch_size, pca_path, val_frequency=1):
    """A ``cur_task_setting.json``-schema dict wired for the rehearsal
    (canonical base: ``liftreg_tpu.utils.settings``)."""
    return default_task_setting(data_path, exp_path, size, overrides={
        "train": {
            "dataloader": {"batch_size": batch_size},
            "epoch": epochs,
            "model": {"drr_feature_num": n_proj, "latent_dim": latent,
                      "pca_path": pca_path},
            "save_3d_img": True,
            "save_model_frequency": 5,
            "val_frequency": val_frequency,
        },
    })


def placeholder_pca(out_dir, size, latent, seed=0, magnitude=0.03):
    """Smooth random low-rank basis — lets the chain run without a trained
    dense model; NOT a statistical deformation model of real motion."""
    from liftreg_tpu import pca as pca_lib
    from tools.make_synthetic_dataset import random_disp

    rng = np.random.default_rng(seed)
    fields = [random_disp(rng, size, magnitude) for _ in range(2 * latent)]
    vectors, mean = pca_lib.fit_pca(np.stack(
        [f.reshape(-1) for f in fields]), latent)
    pca_lib.save_pca(out_dir, vectors, mean)
    return out_dir


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Raw DirLab .img -> evaluate_result.csv, one command")
    p.add_argument("--raw_path", required=True,
                   help="folder of raw cases (DirLab layout)")
    p.add_argument("--landmarks", default="",
                   help="folder of {case}_300_{iBH,eBH}_xyz_r1.txt files")
    p.add_argument("--out", required=True, help="output root")
    p.add_argument("--file_type", default="copd", choices=["copd", "dct"])
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--latent", type=int, default=56)
    p.add_argument("--scan_num", type=int, default=4)
    p.add_argument("--scan_range", type=float, default=30.0)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--size", type=int, default=160)
    p.add_argument("--pca_path", default="",
                   help="existing pca_vectors/pca_mean folder; omitted -> "
                        "smooth random placeholder basis")
    p.add_argument("--shape", type=int, nargs=3, default=None,
                   help="override raw (z,y,x) shape for every case")
    p.add_argument("--spacing", type=float, nargs=3, default=None,
                   help="override raw (z,y,x) spacing in mm")
    args = p.parse_args(argv)

    task_root = os.path.join(os.path.abspath(args.out), "dataset")
    pre = os.path.join(task_root, "preprocessed")
    os.makedirs(pre, exist_ok=True)

    # 1. preprocessing (raw -> npy sets + id lists). The same cases serve as
    # the train corpus and the test/eval set unless you train on a separate
    # corpus first (reference splits, ``tools/preprocessing.py:354-379``).
    ids = preprocess(args.raw_path, pre, FILE_TYPE[args.file_type],
                     target_size=(args.size,) * 3,
                     shape_override=args.shape,
                     spacing_override=args.spacing)
    if not ids:
        raise SystemExit(f"no cases found under {args.raw_path}")
    save_id_list(task_root, "data_id", ids, mode="train")
    save_id_list(task_root, "data_id", ids, mode="test")

    # 2. landmarks into the layout the TRE evaluator expects
    if args.landmarks:
        lm_dir = os.path.join(task_root, "landmarks")
        os.makedirs(lm_dir, exist_ok=True)
        for f in os.listdir(args.landmarks):
            if f.endswith(".txt"):
                shutil.copy(os.path.join(args.landmarks, f),
                            os.path.join(lm_dir, f))

    # 3. DRRs
    generate_drrs(task_root, "drr", scan_range=args.scan_range,
                  scan_num=args.scan_num)

    # 4. PCA basis
    pca_path = args.pca_path or placeholder_pca(
        os.path.join(task_root, "pca"), args.size, args.latent)
    if not args.pca_path:
        print("note: using a smooth random placeholder PCA basis — pass "
              "--pca_path (e.g. from tools/build_pca.py --from_experiment) "
              "for a real statistical deformation subspace")

    # 5. train
    from liftreg_tpu.train import RegistrationTrainer
    exp_path = os.path.join(os.path.abspath(args.out), "exp")
    os.makedirs(exp_path, exist_ok=True)
    setting = build_setting(task_root, exp_path, args.size, args.latent,
                            args.scan_num, args.epochs, args.batch_size,
                            pca_path)
    RegistrationTrainer(setting).run()

    # 6. test + TRE eval -> evaluate_result.csv
    from liftreg_tpu.utils.tre import eval_copd_highres
    setting["train"]["mode"] = "test"
    setting["train"]["test_from"] = os.path.join(
        exp_path, "checkpoints", "model_best.ckpt")
    RegistrationTrainer(setting).run()
    spacing_table = None
    if args.spacing is not None:
        spacing_table = {cid: np.flipud(np.asarray(args.spacing, np.float64))
                         for cid in ids}
    results = eval_copd_highres(task_root, exp_path,
                                spacing_table=spacing_table,
                                dim=(args.size,) * 3)
    csv = os.path.join(exp_path, "evaluate_result.csv")
    print(f"wrote {csv} ({len(results)} cases)")
    return csv


if __name__ == "__main__":
    main()
