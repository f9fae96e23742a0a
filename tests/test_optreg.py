"""Dense 3D-3D optimization registration (optreg) — the basis builder's
core. Validates the two claims the learned-PCA workflow rests on:

1. per-pair optimization recovers the ground-truth deformation WHERE THE
   IMAGES CARRY INFORMATION (inside the lung, where the vascular texture
   lives). Outside structure, displacement is unobservable from images —
   any intensity-driven method leaves the regularizer to fill it in, so
   whole-volume field error is NOT a valid recovery metric (this is why
   the field's quality target, TRE, is defined at landmarks);
2. PCA over recovered fields SPANS the true deformation subspace on those
   informative voxels for HELD-OUT pairs (the basis-span oracle that
   measured rel-residual ~1.0 for a 3-epoch dense RegNet's fields,
   DEMO.md "Learned-PCA workflow at 160^3").

Fixture notes (each choice is load-bearing, measured in round 4):
* vascular phantoms (`make_phantom(texture="vascular")`) — band-limited
  noise textures are NOT identifiable: NCC collapses 10x while the field
  moves AWAY from GT (err ratio 1.45 at reg 1e-4). Vessel trees make NCC
  rank by alignment, the same finding as the 160^3 refinement campaign.
* GT deformations generated ON the finest control grid (trilinear
  upsample from 8^3) so the grid's representation floor is ~0 and the
  tests measure the OPTIMIZER (with band-limited-noise GT, even the
  GT-projected-onto-grid field misses the thresholds: floor 0.185 vs
  0.110 achieved).
* one shared anatomy across pairs (same-patient pairs, as in DirLab) —
  per-pair anatomies window each recovered field by a different lung
  mask and the span residual becomes geometry noise (0.64 measured).
"""
import numpy as np
import pytest

import jax.image
import jax.numpy as jnp

from liftreg_tpu import pca as pca_lib
from liftreg_tpu.coords import identity_map
from liftreg_tpu.data.dataset import normalize_intensity
from liftreg_tpu.models.subspace_backproj import expand_pca
from liftreg_tpu.ops import resample
from liftreg_tpu.optreg import DenseRegisterer

from tools.make_synthetic_dataset import make_phantom

SZ, LATENT, N_PAIRS, N_TRAIN = 24, 4, 8, 6
LEVELS = ((4, 60, 0.05), (8, 50, 0.02))


def _grid_basis(rng, latent, sz, amp=0.12, grid=8):
    v = rng.normal(size=(latent, 3, grid, grid, grid)).astype(np.float32)
    v = np.asarray(jax.image.resize(jnp.asarray(v),
                                    (latent, 3, sz, sz, sz), "linear"))
    v = v / np.abs(v).max() * amp
    return jnp.asarray(v.reshape(latent, -1))


@pytest.fixture(scope="module")
def problem():
    """One shared vascular anatomy, N_PAIRS deformations from a low-rank
    grid basis, and the optreg registrations of the first N_TRAIN pairs."""
    rng = np.random.default_rng(7)
    basis = _grid_basis(rng, LATENT, SZ)
    ct, seg = make_phantom(rng, SZ, texture="vascular")
    vol = jnp.asarray(normalize_intensity(
        ct, linear_clip=True, clip_range=(-1000, 0))
        [None, None].astype(np.float32))
    idm = identity_map((SZ,) * 3)[None]
    targets, gts = [], []
    for _ in range(N_PAIRS):
        z = jnp.asarray(rng.normal(size=(1, LATENT)).astype(np.float32))
        disp = expand_pca(z, basis, jnp.zeros((3 * SZ ** 3,)), (SZ,) * 3)
        targets.append(resample.warp_image(vol, disp + idm,
                                           zero_boundary=True,
                                           scale_intensity=True))
        gts.append(disp)
    target, gt = jnp.concatenate(targets), jnp.concatenate(gts)
    moving = jnp.concatenate([vol] * N_PAIRS)

    reg = DenseRegisterer((SZ,) * 3, levels=LEVELS)
    h = N_TRAIN // 2
    out_a = reg(moving[:h], target[:h])
    out_b = reg(moving[h:N_TRAIN], target[h:N_TRAIN])
    disp = np.concatenate([np.asarray(out_a["disp"]),
                           np.asarray(out_b["disp"])])
    return seg, gt, disp, out_a


@pytest.mark.slow  # shares the ~26s multi-level registration fixture
def test_optreg_recovers_deformation(problem):
    seg, gt, disp, out = problem
    sims = np.asarray(out["sim_history"])
    assert sims[-1] < 0.15 * sims[0], sims
    # field-level recovery ON INFORMATIVE VOXELS, not just the objective
    m = (seg > 0)[None, None]                                # (1,1,D,W,H)
    g = np.asarray(gt[:N_TRAIN])
    err0 = np.sqrt((g ** 2 * m).sum() / (m.sum() * 3 * N_TRAIN))
    err1 = np.sqrt((((disp - g) ** 2) * m).sum() / (m.sum() * 3 * N_TRAIN))
    assert err1 < 0.5 * err0, (err0, err1)                  # measured 0.27
    assert disp.shape == (N_TRAIN, 3, SZ, SZ, SZ)


def test_disp_from_optreg_dataset_path(tmp_path):
    """build_pca --from_optreg: reads a dataset split with the trainer's
    exact normalization (axis-1 flip + HU clip), registers in batches
    (including the pad-to-jitted-shape branch: 3 cases at batch 2), and
    returns one field per case."""
    from tools.build_pca import disp_from_optreg
    from tools.make_synthetic_dataset import generate
    data = str(tmp_path / "data")
    generate(data, n_train=3, n_val=1, n_test=1, sz=16, n_proj=2,
             latent=2, texture="vascular")
    X = disp_from_optreg(data, levels=((4, 20, 0.05),), batch=2,
                         verbose=False)
    assert X.shape == (3, 3 * 16 ** 3)
    assert np.isfinite(X).all()
    vectors, mean = pca_lib.fit_pca(X, 2)
    assert pca_lib.explained_variance_ratio(X, vectors, mean) > 0.5


@pytest.mark.slow  # shares the ~26s multi-level registration fixture
def test_optreg_fields_span_gt_subspace(problem):
    """The end-to-end property the workflow needs: PCA over optreg fields
    must span the GT deformations of HELD-OUT pairs on the informative
    (lung) voxels — rel residual well below the ~1.0 a failed basis
    measures (least-squares fit, since components are not orthonormal
    after masking)."""
    seg, gt, disp, _ = problem
    vectors, mean = pca_lib.fit_pca(disp.reshape(N_TRAIN, -1), LATENT + 1)
    V = np.asarray(vectors, np.float64)
    m3 = np.repeat((seg > 0)[None], 3, 0).reshape(-1)
    for i in range(N_TRAIN, N_PAIRS):                       # held-out
        x = np.asarray(gt[i], np.float64).reshape(-1) - np.asarray(mean)
        xm, Vm = x[m3], V[:, m3]
        coef, *_ = np.linalg.lstsq(Vm.T, xm, rcond=None)
        rel = np.linalg.norm(xm - Vm.T @ coef) / np.linalg.norm(xm)
        assert rel < 0.7, (i, rel)                # measured 0.30 / 0.44


def test_basis_oracle_span_residual(tmp_path):
    """tools/basis_oracle.py: 0.0 for a basis containing the field, ~1.0
    for an orthogonal basis, and the gt_disp phi->disp roundtrip."""
    from liftreg_tpu.coords import identity_map_np
    from tools.basis_oracle import gt_disp, span_residual
    rng = np.random.default_rng(0)
    sz = 8
    x = rng.normal(size=(3 * sz ** 3,))
    mean = np.zeros_like(x)
    V_in = np.stack([x, rng.normal(size=x.shape)])
    assert span_residual(x.copy(), V_in, mean) < 1e-8
    q, _ = np.linalg.qr(np.concatenate([x[:, None],
                                        rng.normal(size=(len(x), 2))], 1))
    V_perp = q[:, 1:].T                      # orthogonal complement of x
    assert span_residual(x.copy(), V_perp, mean) > 0.99
    # phi [0,1] storage convention roundtrip
    disp = rng.normal(size=(3, sz, sz, sz)).astype(np.float32) * 0.05
    phi01 = (disp + identity_map_np((sz,) * 3) + 1.0) / 2.0
    gtdir = tmp_path / "gt_phi"; gtdir.mkdir()
    np.save(gtdir / "c0_phi.npy", phi01)
    np.testing.assert_allclose(gt_disp(str(tmp_path), "c0"), disp,
                               atol=1e-6)
