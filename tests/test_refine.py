"""Instance refinement: test-time optimization over the PCA subspace."""
import numpy as np

import jax
import jax.numpy as jnp

from liftreg_tpu.coords import identity_map
from liftreg_tpu.models.subspace_backproj import expand_pca
from liftreg_tpu.ops import resample
from liftreg_tpu.refine import make_refiner

SZ, LATENT = 16, 6


def _smooth_basis(rng, latent, sz):
    """Low-frequency displacement basis (random fields smoothed by
    separable box passes) so warps are registration-like."""
    v = rng.normal(size=(latent, 3, sz, sz, sz)).astype(np.float32)
    for ax in (2, 3, 4):
        v = (np.roll(v, 1, ax) + v + np.roll(v, -1, ax)) / 3.0
        v = (np.roll(v, 2, ax) + v + np.roll(v, -2, ax)) / 3.0
    v = v / np.abs(v).max() * 0.15
    return jnp.asarray(v.reshape(latent, -1))


def _problem(seed=0):
    rng = np.random.default_rng(seed)
    pca = {"vectors": _smooth_basis(rng, LATENT, SZ),
           "mean": jnp.zeros((3 * SZ ** 3,), jnp.float32)}
    # smooth moving image in [-1, 1]
    m = rng.normal(size=(1, 1, SZ, SZ, SZ)).astype(np.float32)
    for ax in (2, 3, 4):
        m = (np.roll(m, 1, ax) + m + np.roll(m, -1, ax)) / 3.0
    moving = jnp.asarray(np.clip(m / np.abs(m).max(), -1, 1))
    # ground-truth registration inside the subspace span
    z_true = jnp.asarray(rng.normal(size=(1, LATENT)).astype(np.float32))
    disp = expand_pca(z_true, pca["vectors"], pca["mean"], (SZ, SZ, SZ))
    phi = disp + identity_map((SZ, SZ, SZ))[None]
    target = resample.warp_image(moving, phi, zero_boundary=True,
                                 scale_intensity=True)
    return pca, moving, target, z_true


def test_refine_recovers_subspace_warp():
    pca, moving, target, z_true = _problem()
    refiner = make_refiner((SZ, SZ, SZ), n_steps=60, lr=0.1)
    z0 = jnp.zeros((1, LATENT), jnp.float32)
    res = refiner(z0, pca, moving, target)
    sims = np.asarray(res["sim_history"])
    # entry 0 is the unrefined objective; optimization must cut it hard
    assert sims[-1] < 0.5 * sims[0], sims
    # and move the latents toward the ground truth
    d0 = float(jnp.linalg.norm(z0 - z_true))
    d1 = float(jnp.linalg.norm(res["coefs"] - z_true))
    assert d1 < d0


def test_refine_output_contract():
    pca, moving, target, _ = _problem(1)
    n = 7
    refiner = make_refiner((SZ, SZ, SZ), n_steps=n, lr=0.05)
    res = refiner(jnp.zeros((1, LATENT)), pca, moving, target)
    assert res["phi"].shape == (1, 3, SZ, SZ, SZ)
    assert res["warped"].shape == (1, 1, SZ, SZ, SZ)
    assert res["sim_history"].shape == (n + 1,)
    assert res["total_history"].shape == (n + 1,)
    assert np.isfinite(np.asarray(res["total_history"])).all()
    # histories agree at entry 0 with the documented semantics: the scan
    # logs the objective BEFORE each update
    total0 = float(res["total_history"][0])
    assert total0 >= float(res["sim_history"][0])


def test_refine_batched_and_reg_factor():
    """Batched refinement refines each element; a huge reg_factor pins the
    displacement near zero (regularization really flows through)."""
    pca, moving, target, _ = _problem(2)
    moving2 = jnp.concatenate([moving, moving])
    target2 = jnp.concatenate([target, moving])  # element 1: already aligned
    refiner = make_refiner((SZ, SZ, SZ), n_steps=30, lr=0.1)
    res = refiner(jnp.zeros((2, LATENT)), pca, moving2, target2)
    assert res["coefs"].shape == (2, LATENT)
    # element 1's optimum is near-zero displacement; element 0's is not
    disp = np.asarray(res["phi"] - np.asarray(
        identity_map((SZ, SZ, SZ))[None]))
    assert np.abs(disp[1]).mean() < np.abs(disp[0]).mean()

    heavy = make_refiner((SZ, SZ, SZ), n_steps=30, lr=0.1, reg_factor=1e4)
    res_h = heavy(jnp.zeros((1, LATENT)), pca, moving, target)
    disp_h = np.asarray(res_h["phi"]) - np.asarray(
        identity_map((SZ, SZ, SZ))[None])
    assert np.abs(disp_h).max() < 0.01


def test_pipeline_refinement_improves_similarity():
    """RegistrationPipeline(refine_steps=N) fuses refinement into the one
    jitted program and must beat the unrefined pipeline's similarity on
    the pair the objective sees (the lung-masked CT pair)."""
    from liftreg_tpu.losses.similarity import ncc_loss
    from liftreg_tpu.models.subspace_backproj import mask_lung
    from liftreg_tpu.pipeline import RegistrationPipeline, normalize_hu

    rng = np.random.default_rng(3)
    pca = {"vectors": _smooth_basis(rng, LATENT, SZ) * 100.0,
           "mean": jnp.zeros((3 * SZ ** 3,), jnp.float32)}
    base = RegistrationPipeline((SZ, SZ, SZ), latent_dim=LATENT, n_proj=2)
    params = base.init_params(jax.random.PRNGKey(0), pca)
    ref = RegistrationPipeline((SZ, SZ, SZ), latent_dim=LATENT, n_proj=2,
                               refine_steps=40, refine_lr=0.1)

    src_hu = jnp.asarray(rng.uniform(-1000, 0, (1, 1, SZ, SZ, SZ))
                         .astype(np.float32))
    tgt_hu = jnp.asarray(rng.uniform(-1000, 0, (1, 1, SZ, SZ, SZ))
                         .astype(np.float32))
    for ax in (2, 3, 4):  # smooth so NCC has structure to align
        src_hu = (jnp.roll(src_hu, 1, ax) + src_hu
                  + jnp.roll(src_hu, -1, ax)) / 3.0
        tgt_hu = (jnp.roll(tgt_hu, 1, ax) + tgt_hu
                  + jnp.roll(tgt_hu, -1, ax)) / 3.0
    seg = jnp.ones((1, 1, SZ, SZ, SZ), jnp.float32)

    w0, phi0 = base.register(params, pca, src_hu, tgt_hu, seg, seg)
    w1, phi1 = ref.register(params, pca, src_hu, tgt_hu, seg, seg)
    assert w1.shape == w0.shape and phi1.shape == phi0.shape

    target_cp = mask_lung(normalize_hu(tgt_hu), seg)
    sim0 = float(ncc_loss(w0, target_cp))
    sim1 = float(ncc_loss(w1, target_cp))
    assert sim1 < sim0, (sim0, sim1)
