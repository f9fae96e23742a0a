"""Golden tests for the landmark TRE evaluator vs a torch oracle of the
reference spec (``tools/evaluate_dir_lab.py:46-138``), plus the identity-map
oracle (TRE of identity == initial landmark distance)."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from liftreg_tpu.utils import tre


def torch_eval_with_data(source_list, target_list, phi, dim, spacing, origin,
                         phi_spacing):
    """Torch implementation of the spec for cross-checking."""
    origin_list = np.repeat([origin], target_list.shape[0], axis=0)
    target_t = torch.from_numpy((target_list - 1.0) * spacing) - origin_list * phi_spacing
    source_t = torch.from_numpy((source_list - 1.0) * spacing) - origin_list * phi_spacing
    target_t[:, 1] = (dim[1] - 1) * phi_spacing[1] - target_t[:, 1]
    source_t[:, 1] = (dim[1] - 1) * phi_spacing[1] - source_t[:, 1]
    source_norm = source_t / phi_spacing / (dim - 1.0) * 2.0 - 1.0
    source_norm = source_norm.unsqueeze(0).unsqueeze(0).unsqueeze(0)
    phi_t = torch.from_numpy(phi).double()
    warped = F.grid_sample(phi_t, source_norm, align_corners=True)
    warped = torch.flip(warped.permute(0, 2, 3, 4, 1), [4])[0, 0, 0]
    warped = warped * torch.from_numpy(dim - 1.0) * torch.from_numpy(phi_spacing)
    dist = torch.nn.PairwiseDistance(p=2)(target_t, warped)
    per_axis = [torch.mean(torch.abs(target_t[:, i] - warped[:, i])).item()
                for i in range(3)]
    return torch.mean(dist).item(), per_axis


def _random_case(seed):
    rng = np.random.default_rng(seed)
    dim = np.array([20.0, 20.0, 20.0])
    spacing = np.array([0.64, 0.64, 2.5])
    phi_spacing = np.array([2.2, 2.2, 2.2])
    origin = np.array([-3.0, 2.0, 0.0])
    n = 50
    source = rng.uniform(2, 18, size=(n, 3)).astype(np.float32)
    target = (source + rng.normal(scale=1.0, size=(n, 3))).astype(np.float32)
    idm = tre.create_identity(dim.astype(int))  # [0,1] stored form
    disp = rng.normal(scale=0.01, size=idm.shape)
    phi = (idm + disp)[None].astype(np.float64)
    return source, target, phi, dim, spacing, origin, phi_spacing


def test_eval_with_data_matches_torch():
    source, target, phi, dim, spacing, origin, phi_spacing = _random_case(0)
    want, want_axes = torch_eval_with_data(source, target, phi, dim, spacing,
                                           origin, phi_spacing)
    got, got_axes, dists = tre.eval_with_data(source, target, phi, dim,
                                              spacing, origin, phi_spacing)
    assert got == pytest.approx(want, rel=1e-10)
    np.testing.assert_allclose(got_axes, want_axes, rtol=1e-10)
    assert dists.shape == (50,)


def test_identity_phi_tre_equals_initial_distance():
    """The reference's one numerical oracle (``test_evaluation_script``,
    ``evaluate_dir_lab.py:239-271``): with an identity map and
    origin=0, spacing=phi_spacing, TRE equals the initial landmark
    distance after the y-flip transform."""
    rng = np.random.default_rng(1)
    dim = np.array([16.0, 16.0, 16.0])
    spacing = phi_spacing = np.array([2.2, 2.2, 2.2])
    origin = np.zeros(3)
    n = 40
    source = rng.uniform(3, 13, size=(n, 3)).astype(np.float32)
    target = (source + rng.normal(scale=0.8, size=(n, 3))).astype(np.float32)
    phi = tre.create_identity(dim.astype(int))[None]  # [0,1] stored form
    got, _, dists = tre.eval_with_data(source, target, phi, dim, spacing,
                                       origin, phi_spacing)
    # identity: warped(source) == source position; distance unaffected by the
    # rigid y-flip; expected = mean ||(t-s)*spacing||
    expect = np.mean(np.linalg.norm((target - source) * spacing, axis=1))
    assert got == pytest.approx(expect, rel=1e-5)


def test_tre_statistics():
    vals = np.array([1.0, 2.0, 11.0, 12.0])
    stats = tre.compute_tre_statistics(vals)
    assert stats["GFR"] == pytest.approx(0.5)
    assert stats["percentile_50"] == pytest.approx(np.percentile(vals, 50))


def test_read_points(tmp_path):
    p = tmp_path / "pts.txt"
    p.write_text("1.5\t2.5\t3.5\n4\t5\t6\n\n")
    pts = tre.read_points(str(p))
    np.testing.assert_allclose(pts, [[1.5, 2.5, 3.5], [4, 5, 6]])


def test_metrics_dice():
    from liftreg_tpu.utils.metrics import get_multi_metric
    pred = np.zeros((1, 4, 4), np.int32)
    gt = np.zeros((1, 4, 4), np.int32)
    pred[0, :2] = 1
    gt[0, 1:3] = 1
    res = get_multi_metric(pred, gt)
    # label 1: tp=4, fp=4, fn=4 -> dice = 8/16
    assert res["batch_avg_res"]["dice"][0, 1] == pytest.approx(0.5, abs=1e-6)
    assert res["batch_avg_res"]["iou"][0, 1] == pytest.approx(4 / 12, abs=1e-6)
