"""End-to-end numerical oracle: the ground-truth deformation of a synthetic
case must score ~zero TRE through the full evaluator (landmark conventions,
SAR->SPR flips, [0,1] phi storage all mutually consistent), and far below
the identity baseline."""
import os

import numpy as np
import pytest

from liftreg_tpu.utils import tre


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    from tools.make_synthetic_dataset import generate
    out = str(tmp_path_factory.mktemp("gt_oracle"))
    generate(out, n_train=1, n_val=1, n_test=2, sz=32, n_proj=2, latent=2,
             seed=3)
    return out


def _eval_case(data_path, cid, phi01, dim=32):
    src_pts = tre.read_points(
        os.path.join(data_path, "landmarks", f"{cid}_300_eBH_xyz_r1.txt"))
    tgt_pts = tre.read_points(
        os.path.join(data_path, "landmarks", f"{cid}_300_iBH_xyz_r1.txt"))
    spacing = phi_spacing = np.full(3, 2.2)
    res, _, _ = tre.eval_with_data(src_pts, tgt_pts, phi01[None],
                                   np.full(3, float(dim)), spacing,
                                   np.zeros(3), phi_spacing)
    return res


def test_gt_phi_scores_near_zero_tre(synth):
    test_ids = [str(i) for i in
                np.load(os.path.join(synth, "test", "data_id.npy"))]
    for cid in test_ids:
        gt = np.load(os.path.join(synth, "gt_phi", f"{cid}_phi.npy"))
        tre_gt = _eval_case(synth, cid, gt.astype(np.float64))
        identity = tre.create_identity(np.full(3, 32))
        tre_id = _eval_case(synth, cid, identity)
        # GT should be (near) exact; identity reflects the deformation size
        assert tre_gt < 0.05, (cid, tre_gt, tre_id)
        assert tre_id > 10 * max(tre_gt, 1e-3), (cid, tre_gt, tre_id)


def test_low_rank_deformation_dataset(tmp_path):
    """--deformation_rank: all generated fields live in the shared
    subspace, so a rank-sized PCA basis explains ~all variance."""
    from tools.make_synthetic_dataset import generate
    from liftreg_tpu import pca as pca_lib
    import numpy as np

    out = str(tmp_path / "lowrank")
    generate(out, n_train=6, n_val=1, n_test=1, sz=24, n_proj=2, latent=4,
             seed=3, deformation_rank=4)
    vectors = np.load(out + "/pca/pca_vectors.npy")
    assert vectors.shape[0] == 4
    # reconstruct each case's stored GT field from the basis: residual ~ 0
    import glob
    from liftreg_tpu.coords import identity_map_np
    idm = identity_map_np((24, 24, 24)).reshape(-1)
    mean = np.load(out + "/pca/pca_mean.npy")
    scale = np.linalg.norm(vectors, axis=1, keepdims=True)
    vn = vectors / scale
    for f in glob.glob(out + "/gt_phi/*_phi.npy"):
        disp = (np.load(f).reshape(3 * 24 ** 3) * 2.0 - 1.0) - idm
        centered = disp - mean
        recon = (centered @ vn.T) @ vn
        resid = np.linalg.norm(centered - recon) / max(
            np.linalg.norm(centered), 1e-9)
        assert resid < 0.05, resid
