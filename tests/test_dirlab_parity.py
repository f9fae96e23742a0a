"""DirLab parity harness (VERDICT r3 #2): identity oracle green on a
synthetic fixture, informative failure on perturbed expectations/phi, and
hardened landmark parsing (CRLF, trailing tabs, count check) vs the
reference's fragile parser (``/root/reference/tools/evaluate_dir_lab.py:21-43``).
"""
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from liftreg_tpu.utils.tre import read_points  # noqa: E402


def _write_lm(path, pts):
    with open(path, "w") as f:
        for p in pts:
            f.write(f"{p[0]:.4f}\t{p[1]:.4f}\t{p[2]:.4f}\n")


def _fixture(tmp_path, n_cases=2, dim=32, n_pts=20, seed=0):
    """Landmark-only dataset: identity TRE is computable in closed form
    (no prop file -> origin 0, spacing 2.2 iso; the affine landmark->mm
    chain is distance-preserving, so TRE = 2.2 * mean||iBH - eBH||)."""
    rng = np.random.default_rng(seed)
    lm = tmp_path / "data" / "landmarks"
    lm.mkdir(parents=True)
    truth = {}
    for i in range(n_cases):
        cid = f"syn{i + 1}"
        tgt = rng.uniform(8, dim - 8, size=(n_pts, 3))
        src = tgt + rng.uniform(-3, 3, size=(n_pts, 3))
        _write_lm(lm / f"{cid}_300_iBH_xyz_r1.txt", src)
        _write_lm(lm / f"{cid}_300_eBH_xyz_r1.txt", tgt)
        truth[cid] = float(np.mean(
            np.linalg.norm((src - tgt) * 2.2, axis=1)))
    return str(tmp_path / "data"), truth


def _write_expectations(tmp_path, truth, tol=0.05):
    exp = {"initial_tre_mm": dict(truth), "initial_tol_mm": tol,
           "published": {"per_case_tre_mm": {}, "mean_tre_mm": None,
                         "tol_mm": 0.5}}
    path = tmp_path / "expect.json"
    path.write_text(json.dumps(exp))
    return str(path)


def test_identity_oracle_green(tmp_path, capsys):
    from tools.dirlab_parity import main

    data, truth = _fixture(tmp_path)
    expect = _write_expectations(tmp_path, truth)
    rc = main(["--data", data, "--identity", "--size", "32",
               "--expected", expect])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "PARITY OK" in out
    for cid in truth:
        assert cid in out


def test_perturbed_expectation_fails_informatively(tmp_path, capsys):
    from tools.dirlab_parity import main

    data, truth = _fixture(tmp_path)
    truth["syn2"] += 5.0  # deliberately wrong expectation
    expect = _write_expectations(tmp_path, truth)
    rc = main(["--data", data, "--identity", "--size", "32",
               "--expected", expect])
    out = capsys.readouterr().out
    assert rc == 1
    assert "PARITY FAIL" in out
    fail_lines = [l for l in out.splitlines() if "FAIL" in l and "syn" in l]
    assert len(fail_lines) == 1 and "syn2" in fail_lines[0]
    assert "-5.0" in fail_lines[0] or "-4.9" in fail_lines[0]  # signed diff shown


def test_perturbed_phi_fails(tmp_path, capsys):
    """A deliberately perturbed experiment phi must be flagged against a
    filled published table (here: published = the identity truth, so any
    non-identity phi with displacement beyond tol fails)."""
    from liftreg_tpu.utils import tre
    from tools.dirlab_parity import main

    data, truth = _fixture(tmp_path, n_cases=1)
    # experiment layout with a perturbed phi for copd1
    exp_dir = tmp_path / "exp"
    (exp_dir / "tests").mkdir(parents=True)
    phi = tre.create_identity((32, 32, 32)).astype(np.float32)
    phi += 0.05  # ~ 3.4 mm shift at 2.2 mm spacing, far beyond tol
    np.save(exp_dir / "tests" / "syn1_phi.npy", phi)
    # test id list for eval_copd_highres
    test_dir = tmp_path / "data" / "test"
    test_dir.mkdir(parents=True)
    np.save(test_dir / "data_id.npy", np.array(["syn1"]))
    (tmp_path / "data" / "preprocessed").mkdir()

    exp = {"initial_tre_mm": {}, "published":
           {"per_case_tre_mm": dict(truth), "mean_tre_mm": None,
            "tol_mm": 0.05}}
    expect = tmp_path / "expect.json"
    expect.write_text(json.dumps(exp))
    rc = main(["--data", data, "--exp", str(exp_dir), "--size", "32",
               "--expected", str(expect)])
    out = capsys.readouterr().out
    assert rc == 1 and "PARITY FAIL" in out and "syn1" in out


def test_read_points_hardened(tmp_path):
    p = tmp_path / "lm.txt"
    # CRLF line endings + trailing tab + trailing blank lines
    p.write_bytes(b"1.0\t2.0\t3.0\t\r\n4.5\t5.5\t6.5\r\n\r\n\r\n")
    pts = read_points(str(p))
    assert pts.shape == (2, 3)
    np.testing.assert_allclose(pts, [[1.0, 2.0, 3.0], [4.5, 5.5, 6.5]])
    # count enforcement
    with pytest.raises(ValueError, match="expected 300 landmarks, parsed 2"):
        read_points(str(p), expect_count=300)
    # malformed line -> clear location
    p.write_text("1.0\t2.0\n")
    with pytest.raises(ValueError, match="lm.txt:1"):
        read_points(str(p))
    # runs of spaces instead of tabs still parse
    p.write_text("1 2 3\n4 5 6\n")
    assert read_points(str(p)).shape == (2, 3)


def test_default_expectations_file_valid():
    from tools.dirlab_parity import DEFAULT_EXPECTATIONS, load_expectations

    exp = load_expectations(DEFAULT_EXPECTATIONS)
    init = exp["initial_tre_mm"]
    cases = [f"copd{i}" for i in range(1, 11)]
    assert all(c in init for c in cases)
    # per-case table must be self-consistent with its stated mean
    mean = np.mean([init[c] for c in cases])
    assert abs(mean - init["mean"]) < 0.01
    assert exp["landmarks_per_case"] == 300
