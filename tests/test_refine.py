"""Instance refinement: test-time optimization over the PCA subspace."""
import numpy as np
import pytest

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


@pytest.mark.slow  # ~21s e2e pipeline on the 1-core CPU
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

    # refine_fast_vjp routes refinement's warp gradients through the
    # no-re-gather custom VJP (resample fast_vjp paths). Op-level gradient
    # equality is pinned to 1e-5 in test_resample.py; over 40 adam steps
    # the residual arithmetic difference compounds into a different (but
    # comparably good) trajectory, so the pipeline-level contract is
    # "improves the similarity like the default path does".
    fv = RegistrationPipeline((SZ, SZ, SZ), latent_dim=LATENT, n_proj=2,
                              refine_steps=40, refine_lr=0.1,
                              refine_fast_vjp=True)
    w2, phi2 = fv.register(params, pca, src_hu, tgt_hu, seg, seg)
    sim2 = float(ncc_loss(w2, target_cp))
    assert sim2 < sim0, (sim0, sim2)
    np.testing.assert_allclose(sim2, sim1, atol=0.05)


def _project_normalized(vol_atten, poses, resolution, spacing):
    from liftreg_tpu.ops import drr
    p = drr.project(vol_atten[:, 0], poses, resolution, spacing)
    return jnp.clip(p, 0.0, 6.0) / 6.0 * 2.0 - 1.0


def test_projection_refiner_recovers_subspace_warp():
    """CBCT-free refinement: only the target's 2D projections constrain
    the optimization, yet the latent must move toward the ground truth."""
    from liftreg_tpu.ops import drr
    from liftreg_tpu.refine import make_projection_refiner

    pca, moving, target, z_true = _problem(4)
    poses = drr.synthesize_poses(30.0, 4, SZ)
    resolution = (24, 24)
    spacing = (2.2, 2.2, 2.2)
    # moving in [-1,1] -> HU -> attenuation; ground-truth projections are
    # the DRRs of the warped attenuation
    hu = (jnp.asarray(moving) - 1.0) * 500.0
    atten = drr.calc_relative_atten_coef(hu)
    disp = None  # target built in _problem via image warp; rebuild proj:
    from liftreg_tpu.coords import identity_map
    from liftreg_tpu.models.subspace_backproj import expand_pca
    from liftreg_tpu.ops import resample
    disp = expand_pca(z_true, pca["vectors"], pca["mean"], (SZ, SZ, SZ))
    phi_true = disp + identity_map((SZ, SZ, SZ))[None]
    warped_atten = resample.warp_image(atten, phi_true, zero_boundary=True,
                                       scale_intensity=False)
    target_proj = _project_normalized(warped_atten, poses, resolution,
                                      spacing)

    refiner = make_projection_refiner((SZ, SZ, SZ), poses, resolution,
                                      spacing, n_steps=60, lr=0.1)
    z0 = jnp.zeros((1, z_true.shape[1]), jnp.float32)
    res = refiner(z0, pca, atten, target_proj)
    sims = np.asarray(res["sim_history"])
    assert sims[-1] < 0.6 * sims[0], sims
    d0 = float(jnp.linalg.norm(z0 - z_true))
    d1 = float(jnp.linalg.norm(res["coefs"] - z_true))
    assert d1 < d0


@pytest.mark.slow  # ~15s e2e pipeline on the 1-core CPU
def test_register_projections_matches_register():
    """register_projections (no target CT) must equal register when fed
    the same projections the pipeline would simulate internally."""
    from liftreg_tpu.ops import drr
    from liftreg_tpu.pipeline import RegistrationPipeline

    sz, latent = 16, 4
    rng = np.random.default_rng(7)
    pipe = RegistrationPipeline((sz, sz, sz), latent_dim=latent, n_proj=2)
    pca = {"vectors": jnp.asarray(
        rng.normal(size=(latent, 3 * sz ** 3)).astype(np.float32) * 0.01),
        "mean": jnp.zeros((3 * sz ** 3,), jnp.float32)}
    params = pipe.init_params(jax.random.PRNGKey(0), pca)
    src = jnp.asarray(rng.uniform(-1000, 0, (1, 1, sz, sz, sz))
                      .astype(np.float32))
    tgt = jnp.asarray(rng.uniform(-1000, 0, (1, 1, sz, sz, sz))
                      .astype(np.float32))
    seg = jnp.ones((1, 1, sz, sz, sz), jnp.float32)

    w_full, phi_full = pipe.register(params, pca, src, tgt, seg, seg)
    atten_t = drr.calc_relative_atten_coef(tgt[:, 0])
    proj = _project_normalized(atten_t[:, None], jnp.asarray(pipe.poses),
                               pipe.resolution, pipe.spacing)
    w_p, phi_p = pipe.register_projections(params, pca, src, proj, seg)
    np.testing.assert_allclose(np.asarray(w_p), np.asarray(w_full),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(phi_p), np.asarray(phi_full),
                               atol=1e-6)


@pytest.mark.slow  # ~18s e2e pipeline on the 1-core CPU
def test_pipeline_projection_refinement():
    """refine_domain='projection': the fused projection-domain refinement
    must cut the projection mismatch, without ever reading a target CT."""
    from liftreg_tpu.ops import drr, resample
    from liftreg_tpu.pipeline import RegistrationPipeline

    sz = SZ
    pca, moving, target, z_true = _problem(5)
    # build HU pair from the synthetic problem
    src_hu = (jnp.asarray(moving) - 1.0) * 500.0
    pipe0 = RegistrationPipeline((sz, sz, sz), latent_dim=LATENT, n_proj=4)
    params = pipe0.init_params(jax.random.PRNGKey(1), pca)
    pipe_r = RegistrationPipeline((sz, sz, sz), latent_dim=LATENT,
                                  n_proj=4, refine_steps=40, refine_lr=0.1,
                                  refine_domain="projection")
    atten_src = drr.calc_relative_atten_coef(src_hu)
    # ground-truth projections: warp the attenuation by the true map
    from liftreg_tpu.coords import identity_map
    from liftreg_tpu.models.subspace_backproj import expand_pca
    disp = expand_pca(z_true, pca["vectors"], pca["mean"], (sz, sz, sz))
    phi_true = disp + identity_map((sz, sz, sz))[None]
    warped_atten = resample.warp_image(atten_src, phi_true,
                                       zero_boundary=True,
                                       scale_intensity=False)
    tproj = _project_normalized(warped_atten, jnp.asarray(pipe0.poses),
                                pipe0.resolution, pipe0.spacing)

    def proj_mismatch(phi):
        wa = resample.warp_image(atten_src, phi, zero_boundary=True,
                                 scale_intensity=False)
        p = _project_normalized(wa, jnp.asarray(pipe0.poses),
                                pipe0.resolution, pipe0.spacing)
        return float(jnp.mean((p - tproj) ** 2))

    _, phi0 = pipe0.register_projections(params, pca, src_hu, tproj)
    _, phi1 = pipe_r.register_projections(params, pca, src_hu, tproj)
    m0, m1 = proj_mismatch(phi0), proj_mismatch(phi1)
    assert m1 < 0.5 * m0, (m0, m1)


def test_refine_never_worse_than_amortized():
    """Best-iterate selection: even with a destructive learning rate, the
    returned iterate's objective can't exceed the unrefined one."""
    pca, moving, target, _ = _problem(8)
    refiner = make_refiner((SZ, SZ, SZ), n_steps=10, lr=50.0)  # absurd lr
    res = refiner(jnp.zeros((1, LATENT)), pca, moving, target)
    hist = np.asarray(res["total_history"])
    assert hist[-1] <= hist[0] + 1e-6, hist
    # with a sane lr, the selected iterate matches the trajectory minimum
    sane = make_refiner((SZ, SZ, SZ), n_steps=20, lr=0.1)
    res2 = sane(jnp.zeros((1, LATENT)), pca, moving, target)
    h2 = np.asarray(res2["total_history"])
    assert h2[-1] <= h2[:-1].min() + 1e-5, h2


def test_projection_refiner_robust_to_measurement_noise():
    """Real projections carry detector noise; refinement against noisy
    measurements must still move the latent toward the ground truth."""
    from liftreg_tpu.coords import identity_map
    from liftreg_tpu.models.subspace_backproj import expand_pca
    from liftreg_tpu.ops import drr, resample
    from liftreg_tpu.refine import make_projection_refiner

    pca, moving, target, z_true = _problem(9)
    poses = drr.synthesize_poses(30.0, 4, SZ)
    resolution, spacing = (24, 24), (2.2, 2.2, 2.2)
    hu = (jnp.asarray(moving) - 1.0) * 500.0
    atten = drr.calc_relative_atten_coef(hu)
    disp = expand_pca(z_true, pca["vectors"], pca["mean"], (SZ, SZ, SZ))
    phi_true = disp + identity_map((SZ, SZ, SZ))[None]
    warped_atten = resample.warp_image(atten, phi_true, zero_boundary=True,
                                       scale_intensity=False)
    clean = _project_normalized(warped_atten, poses, resolution, spacing)
    # 3% of the [-1,1] range — visible detector noise
    rng = np.random.default_rng(99)
    noisy = clean + jnp.asarray(
        rng.normal(scale=0.06, size=clean.shape).astype(np.float32))

    refiner = make_projection_refiner((SZ, SZ, SZ), poses, resolution,
                                      spacing, n_steps=60, lr=0.1)
    z0 = jnp.zeros((1, z_true.shape[1]), jnp.float32)
    res = refiner(z0, pca, atten, noisy)
    d0 = float(jnp.linalg.norm(z0 - z_true))
    d1 = float(jnp.linalg.norm(res["coefs"] - z_true))
    # Measured envelope at this toy scale (16^3 volume, 24^2 detector,
    # 6-dim latent): clean measurements converge to ~0.09 latent distance;
    # 3%-of-range noise stalls recovery at ~1.3 (the few detector pixels
    # are noise-dominated). Still a >45% improvement over the unrefined
    # latent — and the best-iterate guarantee caps the downside at zero.
    assert d1 < 0.6 * d0, (d0, d1)
    res_clean = refiner(z0, pca, atten, clean)
    d1_clean = float(jnp.linalg.norm(res_clean["coefs"] - z_true))
    assert d1_clean < 0.1 * d0, (d0, d1_clean)


def test_refine_per_sample_never_worse():
    """B=2 where one element is adversarial (already aligned, huge lr
    pressure): each sample independently must end no worse than its own
    amortized objective — batch-mean selection would let a diverging
    element be returned worse."""
    pca, moving, target, _ = _problem(10)
    moving2 = jnp.concatenate([moving, moving])
    # element 0: real problem; element 1: already perfectly aligned
    target2 = jnp.concatenate([target, moving])
    refiner = make_refiner((SZ, SZ, SZ), n_steps=25, lr=5.0)  # destructive
    res = refiner(jnp.zeros((2, LATENT)), pca, moving2, target2)
    # per-sample selected totals must not exceed the z0 objective: z0 is
    # in the scanned trajectory, so selection can always fall back to it
    z0res = np.asarray(res["total_per_sample"])
    # evaluate z0 objective directly via a 0-step refiner
    zero = make_refiner((SZ, SZ, SZ), n_steps=0, lr=0.1)
    base0 = np.asarray(zero(jnp.zeros((2, LATENT)), pca, moving2,
                            target2)["total_per_sample"])
    assert (z0res <= base0 + 1e-6).all(), (z0res, base0)


def test_projection_refiner_rejects_volume_only_sim():
    from liftreg_tpu.ops import drr
    from liftreg_tpu.refine import make_projection_refiner

    poses = drr.synthesize_poses(30.0, 2, SZ)
    with pytest.raises(ValueError, match="3D-volume-only"):
        make_projection_refiner((SZ, SZ, SZ), poses, (24, 24),
                                sim="lncc")


@pytest.mark.slow  # ~14s e2e pipeline on the 1-core CPU
def test_register_projections_rejects_image_refiner():
    from liftreg_tpu.pipeline import RegistrationPipeline

    pipe = RegistrationPipeline((SZ, SZ, SZ), latent_dim=4, n_proj=2,
                                refine_steps=3, refine_domain="image")
    rng = np.random.default_rng(0)
    pca = {"vectors": jnp.asarray(
        rng.normal(size=(4, 3 * SZ ** 3)).astype(np.float32) * 0.01),
        "mean": jnp.zeros((3 * SZ ** 3,), jnp.float32)}
    params = pipe.init_params(jax.random.PRNGKey(0), pca)
    src = jnp.zeros((1, 1, SZ, SZ, SZ), jnp.float32) - 500.0
    proj = jnp.zeros((1, 2) + pipe.resolution, jnp.float32)
    with pytest.raises(ValueError, match="refine_domain"):
        pipe.register_projections(params, pca, src, proj)


@pytest.mark.slow  # ~22s while_loop compile on the 1-core CPU
def test_early_stop_matches_scan_and_exits_early():
    """early_stop_patience: results match the fixed scan when the budget
    is never cut, and a converged start exits well before n_steps."""
    import jax
    rng = np.random.default_rng(31)
    sz = (12, 12, 12)
    L, B = 4, 2
    n = 3 * 12 ** 3
    pca = {"vectors": jnp.asarray(
               rng.normal(size=(L, n)).astype(np.float32) * 0.01),
           "mean": jnp.zeros((n,), jnp.float32)}
    moving = jnp.asarray(rng.uniform(-1, 1, (B, 1) + sz).astype(np.float32))
    z_true = jnp.asarray(rng.normal(size=(B, L)).astype(np.float32))
    from liftreg_tpu.refine import make_refiner
    ref_plain = make_refiner(sz, n_steps=12, lr=0.05)
    # build the target as the true-warped moving so refinement has signal
    from liftreg_tpu.models.subspace_backproj import expand_pca
    from liftreg_tpu.coords import identity_map
    from liftreg_tpu.ops import resample
    disp = expand_pca(z_true, pca["vectors"], pca["mean"], sz)
    target = resample.warp_image(moving, disp + identity_map(sz)[None])

    z0 = jnp.zeros((B, L), jnp.float32)
    out_plain = ref_plain(z0, pca, moving, target)

    # patience larger than n_steps -> identical trajectory and outputs
    ref_es = make_refiner(sz, n_steps=12, lr=0.05,
                          early_stop_patience=99, early_stop_tol=0.0)
    out_es = ref_es(z0, pca, moving, target)
    np.testing.assert_allclose(np.asarray(out_es["coefs"]),
                               np.asarray(out_plain["coefs"]),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(out_es["total_history"]),
                               np.asarray(out_plain["total_history"]),
                               rtol=1e-6, atol=1e-7)
    assert int(out_es["steps_run"]) == 13      # n_steps + 1

    # starting AT the optimum with a loose tol -> exits at the patience
    ref_fast = make_refiner(sz, n_steps=12, lr=1e-4,
                            early_stop_patience=2, early_stop_tol=1e-2)
    out_fast = ref_fast(z_true, pca, moving, target)
    assert int(out_fast["steps_run"]) < 13
    # the best-iterate guarantee still holds PER SAMPLE: never worse than
    # that sample's own unrefined objective
    ref0 = make_refiner(sz, n_steps=0, lr=1e-4)
    init_per_sample = ref0(z_true, pca, moving, target)["total_per_sample"]
    assert np.all(np.asarray(out_fast["total_per_sample"])
                  <= np.asarray(init_per_sample) + 1e-6)
