"""Tests: ParameterDict semantics, PCA builder, preprocessing helpers."""
import json
import os

import numpy as np
import pytest

from liftreg_tpu import pca as pca_lib
from liftreg_tpu.utils.config import ParameterDict


def test_parameter_dict_defaults_and_comments(tmp_path):
    p = ParameterDict(printSettings=False)
    p["registration_model"] = ({}, "general settings for registration models")
    p["registration_model"]["similarity_measure"] = ({}, "settings")
    p["registration_model"]["similarity_measure"]["type"] = ("ssd", "sim type")
    # read with default materializes the key
    assert p["registration_model"][("nrOfIterations", 10, "iters")] == 10
    assert p.ext["registration_model"]["nrOfIterations"] == 10
    # categories returned as ParameterDict
    sub = p["registration_model"]
    assert isinstance(sub, ParameterDict)
    assert sub["similarity_measure"]["type"] == "ssd"
    # round trip
    f = tmp_path / "cfg.json"
    p.write_ext_JSON(str(f))
    q = ParameterDict(printSettings=False)
    q.load_JSON(str(f))
    assert q["registration_model"]["nrOfIterations"] == 10
    # comments recorded
    fc = tmp_path / "com.json"
    p.write_JSON_comments(str(fc))
    com = json.loads(fc.read_text())
    assert com["registration_model"]["similarity_measure"]["type"] == "sim type"


def test_parameter_dict_used_params_tree(tmp_path):
    p = ParameterDict(printSettings=False)
    p.ext = {"a": 1, "b": {"c": 2}, "unused": 3}
    assert p["a"] == 1
    assert p["b"]["c"] == 2
    f = tmp_path / "int.json"
    p.write_JSON(str(f), save_int=True)
    used = json.loads(f.read_text())
    assert used == {"a": 1, "b": {"c": 2}}  # 'unused' never read


def test_pca_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    # snapshots living in a 3D subspace + noise
    basis = rng.normal(size=(3, 50))
    coefs = rng.normal(size=(20, 3))
    X = coefs @ basis + 0.01 * rng.normal(size=(20, 50))
    vectors, mean = pca_lib.fit_pca(X, 3)
    assert vectors.shape == (3, 50)
    # rows unit norm, mutually orthogonal
    np.testing.assert_allclose(np.linalg.norm(vectors, axis=1), 1.0, rtol=1e-4)
    ratio = pca_lib.explained_variance_ratio(X, vectors, mean)
    assert ratio > 0.99
    pca_lib.save_pca(str(tmp_path), vectors, mean)
    assert os.path.exists(tmp_path / "pca_vectors.npy")


def test_preprocessing_pad_crop():
    from liftreg_tpu.data.preprocessing import pad_crop_to
    vol = np.ones((10, 20, 30), np.float32)
    out, origin = pad_crop_to(vol, (16, 16, 16))
    assert out.shape == (16, 16, 16)
    # axis0 padded by 3 both sides -> origin -3; axis1 cropped from 2
    assert origin[0] == -3 and origin[1] == 2 and origin[2] == 7


def test_preprocessing_kmeans_threshold():
    from liftreg_tpu.data.preprocessing import _kmeans2_threshold
    vals = np.concatenate([np.full(100, -800.0), np.full(100, 40.0)])
    thr = _kmeans2_threshold(vals)
    assert -800 < thr < 40
    assert thr == pytest.approx((-800 + 40) / 2, abs=1.0)


def test_seg_lung_mask_on_phantom():
    from liftreg_tpu.data.preprocessing import seg_lung_mask
    rng = np.random.default_rng(1)
    D = W = H = 40
    img = np.full((D, W, H), 30.0) + rng.normal(scale=5, size=(D, W, H))
    zz, yy, xx = np.mgrid[0:D, 0:W, 0:H]
    lung = (((zz - 20) / 14) ** 2 + ((yy - 20) / 7) ** 2
            + ((xx - 14) / 5) ** 2) < 1
    lung |= (((zz - 20) / 14) ** 2 + ((yy - 20) / 7) ** 2
             + ((xx - 26) / 5) ** 2) < 1
    # noisy lung: the algorithm replaces exactly-min/max voxels with the
    # mean (``seg_lung_mask:157-160``), so a constant-valued lung vanishes
    img[lung] = -850.0 + rng.normal(scale=10, size=int(lung.sum()))
    mask, bbox = seg_lung_mask(img)
    inter = np.count_nonzero(mask.astype(bool) & lung)
    union = np.count_nonzero(mask.astype(bool) | lung)
    assert inter / union > 0.6  # morphology shifts boundaries slightly


def test_nifti_writer_roundtrip(tmp_path):
    import gzip
    import struct
    from liftreg_tpu.utils.io_utils import save_nifti
    arr = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    path = str(tmp_path / "x.nii.gz")
    save_nifti(path, arr, spacing=(1.5, 2.0, 2.5))
    raw = gzip.open(path, "rb").read()
    assert struct.unpack_from("<i", raw, 0)[0] == 348
    dims = struct.unpack_from("<8h", raw, 40)
    assert dims[:4] == (3, 2, 3, 4)
    data = np.frombuffer(raw[352:], dtype=np.float32).reshape((2, 3, 4),
                                                              order="F")
    np.testing.assert_allclose(data, arr)


def test_expand_pca_bf16_storage(tmp_path):
    """bf16-stored basis (half HBM read) stays within bf16 tolerance of the
    f32 expansion and loads via load_pca(dtype=)."""
    import jax.numpy as jnp
    from liftreg_tpu import pca as pca_lib
    from liftreg_tpu.models.subspace_backproj import expand_pca
    from liftreg_tpu.train.trainer import load_pca

    rng = np.random.default_rng(0)
    L, sz = 6, 8
    vectors = rng.normal(size=(L, 3 * sz ** 3)).astype(np.float32)
    mean = rng.normal(size=(3 * sz ** 3,)).astype(np.float32) * 0.1
    pca_lib.save_pca(str(tmp_path), vectors, mean)
    f32 = load_pca(str(tmp_path))
    bf16 = load_pca(str(tmp_path), dtype=jnp.bfloat16)
    assert bf16["vectors"].dtype == jnp.bfloat16
    assert bf16["mean"].dtype == jnp.float32

    coefs = jnp.asarray(rng.normal(size=(2, L)).astype(np.float32))
    ref = expand_pca(coefs, f32["vectors"], f32["mean"], (sz, sz, sz))
    got = expand_pca(coefs, bf16["vectors"], bf16["mean"], (sz, sz, sz))
    assert got.dtype == jnp.float32
    scale = float(jnp.abs(ref).max())
    rel = float(jnp.abs(ref - got).max()) / scale
    assert rel < 2e-2, rel  # bf16 mantissa level
