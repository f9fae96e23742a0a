"""Dress rehearsal: raw DirLab-format int16 bytes -> evaluate_result.csv
through ONE command (VERDICT r2 #8).

Exercises the full CLI chain byte-for-byte: raw ``.img`` reader ->
resample/segment/crop -> id lists -> DRR generation -> PCA basis ->
subspace training (1 epoch) -> test + deformation save -> landmark TRE ->
CSV. Reference chain: ``tools/preprocessing.py:310-379`` ->
``tools/preprocessingDRR.py`` -> ``main.py`` -> ``eval.py:49``.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

pytestmark = pytest.mark.slow

from tests.test_preprocessing_cli import make_raw_case  # noqa: E402


def _write_landmarks(lm_dir, case, shape, n=12, seed=0):
    """DirLab-style tab-separated 1-indexed (x, y, z) landmark files; the
    same points in both breathing phases (zero motion)."""
    rng = np.random.default_rng(seed)
    d, w, h = shape
    pts = np.stack([rng.uniform(h * 0.3, h * 0.7, n),
                    rng.uniform(w * 0.3, w * 0.7, n),
                    rng.uniform(d * 0.3, d * 0.7, n)], axis=1)
    os.makedirs(lm_dir, exist_ok=True)
    for tag in ("iBH", "eBH"):
        with open(os.path.join(lm_dir, f"{case}_300_{tag}_xyz_r1.txt"),
                  "w") as f:
            for p in pts:
                f.write(f"{p[0]:.2f}\t{p[1]:.2f}\t{p[2]:.2f}\n")


def test_raw_img_to_evaluate_result_csv(tmp_path):
    import pandas as pd

    from tools.dirlab_e2e import main

    shape = (40, 64, 64)
    raw = tmp_path / "raw"
    raw.mkdir()
    for case in ("copd1", "copd2"):
        make_raw_case(raw, case=case, shape=shape)
        _write_landmarks(str(tmp_path / "lm"), case, shape)

    out = tmp_path / "out"
    csv = main([
        "--raw_path", str(raw), "--landmarks", str(tmp_path / "lm"),
        "--out", str(out), "--epochs", "1", "--latent", "4",
        "--scan_num", "2", "--size", "32", "--batch_size", "2",
        "--shape", "40", "64", "64", "--spacing", "2.5", "2.0", "2.0",
    ])

    assert os.path.basename(csv) == "evaluate_result.csv"
    df = pd.read_csv(csv)
    assert sorted(df["id"]) == ["copd1", "copd2"]
    assert np.isfinite(df["dist"]).all() and (df["dist"] >= 0).all()
    assert np.isfinite(df["dice"]).all()
    # the chain's intermediate artifacts all exist
    ds = out / "dataset"
    assert (ds / "preprocessed" / "copd1_source.npy").exists()
    assert (ds / "drr" / "drr" / "drr" / "poses.npy").exists()
    assert (ds / "pca" / "pca_vectors.npy").exists()
    assert (out / "exp" / "checkpoints" / "model_best.ckpt").exists()
    assert (out / "exp" / "tests" / "copd1_phi.npy").exists()
