"""End-to-end preprocessing on synthetic raw DirLab-style volumes."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_raw_case(tmp_path, case="copd1", shape=(40, 64, 64)):
    """Write raw <i2 volumes in the DirLab layout the reader expects."""
    rng = np.random.default_rng(0)
    d, w, h = shape
    zz, yy, xx = np.mgrid[0:d, 0:w, 0:h].astype(np.float32)
    # noise everywhere: constant regions trip the algorithm's exact-min/max
    # replacement (``seg_lung_mask:157-160``), as on real CTs they never occur
    vol = np.abs(rng.normal(scale=5, size=shape)).astype(np.float32)
    body = (((zz - d / 2) / (d * 0.45)) ** 2 + ((yy - w / 2) / (w * 0.38)) ** 2
            + ((xx - h / 2) / (h * 0.38)) ** 2) < 1
    vol[body] = 1054.0 + rng.normal(scale=15, size=int(body.sum()))
    lung = (((zz - d / 2) / (d * 0.3)) ** 2 + ((yy - w / 2) / (w * 0.22)) ** 2
            + ((xx - h * 0.35) / (h * 0.12)) ** 2) < 1
    lung |= (((zz - d / 2) / (d * 0.3)) ** 2 + ((yy - w / 2) / (w * 0.22)) ** 2
             + ((xx - h * 0.65) / (h * 0.12)) ** 2) < 1
    vol[lung] = 174.0 + rng.normal(scale=20, size=int(lung.sum()))
    case_dir = tmp_path / case / case
    case_dir.mkdir(parents=True)
    for tag in ("iBHCT", "eBHCT"):
        vol.astype("<i2").tofile(str(case_dir / f"{case}_{tag}.img"))
    return shape


def test_process_case_pipeline(tmp_path):
    from liftreg_tpu.data.preprocessing import process_case
    shape = make_raw_case(tmp_path)
    case_dir = tmp_path / "copd1" / "copd1"
    src, tgt, src_seg, tgt_seg, origin, spacing = process_case(
        str(case_dir / "copd1_iBHCT.img"), str(case_dir / "copd1_eBHCT.img"),
        shape, (2.5, 2.0, 2.0), target_size=(64, 64, 64),
        target_spacing=(2.2, 2.2, 2.2), seg_bg=True)
    assert src.shape == (64, 64, 64)
    assert tgt.shape == (64, 64, 64)
    assert src.min() >= -1024 and src.max() <= 1100
    # lungs found
    assert src_seg.sum() > 50
    assert tgt_seg.sum() > 50
    assert origin.shape == (3,)


def make_hard_phantom(shape=(64, 96, 96), seed=3):
    """Nastier CT phantom in HU: heavy noise, a bright couch slab under the
    body, and non-lung dark pockets (bowel gas) inside the body — the
    structures that break naive threshold-based lung segmentation on real
    scans (risk flagged in SURVEY section 7). Returns (hu_volume, gt_lung)."""
    rng = np.random.default_rng(seed)
    d, w, h = shape
    zz, yy, xx = np.mgrid[0:d, 0:w, 0:h].astype(np.float32)
    hu = np.full(shape, -1000.0, np.float32)
    hu += rng.normal(scale=20, size=shape).astype(np.float32)  # air noise

    body = (((zz - d / 2) / (d * 0.45)) ** 2
            + ((yy - w / 2) / (w * 0.34)) ** 2
            + ((xx - h / 2) / (h * 0.36)) ** 2) < 1
    hu[body] = 40.0 + rng.normal(scale=30, size=int(body.sum()))

    gt_lung = np.zeros(shape, bool)
    for side in (-1, 1):
        lung = (((zz - d / 2) / (d * 0.32)) ** 2
                + ((yy - w * 0.45) / (w * 0.2)) ** 2
                + ((xx - h / 2 - side * h * 0.16) / (h * 0.12)) ** 2) < 1
        gt_lung |= lung & body
    hu[gt_lung] = -840.0 + rng.normal(scale=50, size=int(gt_lung.sum()))

    # couch: bright slab under the body, spanning the axial direction
    couch = (yy > w * 0.88) & (yy < w * 0.94) & (xx > h * 0.15) & (xx < h * 0.85)
    hu[couch] = 300.0 + rng.normal(scale=20, size=int(couch.sum()))

    # bowel gas: small dark pockets low in the body, outside the lungs
    for cx in (0.35, 0.6):
        gas = (((zz - d * 0.5) / (d * 0.08)) ** 2
               + ((yy - w * 0.72) / (w * 0.05)) ** 2
               + ((xx - h * cx) / (h * 0.05)) ** 2) < 1
        hu[gas & body & ~gt_lung] = -900.0
    return hu, gt_lung


def test_seg_lung_mask_hard_phantom():
    """Lung Dice > 0.9 on the hard phantom (VERDICT r1 item 8)."""
    from liftreg_tpu.data.preprocessing import seg_bg_mask, seg_lung_mask

    hu, gt_lung = make_hard_phantom()
    mask, bbox = seg_lung_mask(hu)
    inter = np.logical_and(mask > 0, gt_lung).sum()
    dice = 2.0 * inter / (np.count_nonzero(mask) + gt_lung.sum())
    assert dice > 0.9, f"lung Dice {dice:.3f} on hard phantom"

    # body mask must cover nearly all true-lung voxels (they sit inside it)
    body_mask, _ = seg_bg_mask(hu)
    recall = np.logical_and(body_mask > 0, gt_lung).sum() / gt_lung.sum()
    assert recall > 0.95, f"body-mask lung recall {recall:.3f}"


def test_preprocessing_cli_main(tmp_path, monkeypatch, capsys):
    import subprocess
    make_raw_case(tmp_path / "raw")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # patch the shape/spacing tables through a small driver using the module
    code = f"""
import sys
sys.path.insert(0, {str(os.path.join(os.path.dirname(__file__), '..'))!r})
import numpy as np
import tools.preprocessing as pp
pp.COPD_SHAPE['copd1'] = [40, 64, 64]
from liftreg_tpu.utils.tre import COPD_SPACING
ids = pp.preprocess({str(tmp_path / 'raw')!r}, {str(tmp_path / 'pre')!r},
                    pp.FILE_TYPE.copd, case_num=5)
pp.save_id_list({str(tmp_path)!r}, 'data_id', ids, mode='test')
print('IDS', ids)
"""
    os.makedirs(tmp_path / "pre", exist_ok=True)
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=500)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "IDS ['copd1']" in r.stdout
    for suffix in ("source", "target", "source_seg", "target_seg", "prop"):
        assert os.path.exists(tmp_path / "pre" / f"copd1_{suffix}.npy")
    assert os.path.exists(tmp_path / "test" / "data_id.npy")
