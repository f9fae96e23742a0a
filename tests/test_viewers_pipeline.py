"""Viewers (headless) and fused-pipeline smoke tests."""
import matplotlib
matplotlib.use("Agg")

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp


def test_viewers_headless():
    import matplotlib.pyplot as plt
    from liftreg_tpu.utils import viewers
    rng = np.random.default_rng(0)
    vol = rng.normal(size=(12, 13, 14)).astype(np.float32)
    flow = rng.normal(size=(3, 12, 13, 14)).astype(np.float32) * 0.1
    fig, vws = viewers.view_volume(vol, block=False)
    vws[0].set_index(3)
    assert vws[0].index == 3
    vws[0].set_index(999)
    assert vws[0].index == 11  # clipped
    plt.close(fig)
    fig2, vws2 = viewers.view_volume(vol, flow=flow, block=False)
    vws2[1].set_index(5)
    plt.close(fig2)
    fig3, vws3 = viewers.view_volume(vol, phi=flow, block=False)
    plt.close(fig3)


def test_checkerboard():
    from liftreg_tpu.utils.visualize import checkerboard_2d
    a = np.zeros((8, 8))
    b = np.ones((8, 8))
    cb = checkerboard_2d(a, b, tiles=4)
    assert cb.sum() == 32  # half the tiles


def test_show_current_images_full_panel(tmp_path):
    """Figure writer with checkerboard + extra/viz rows + labels + phi."""
    from liftreg_tpu.utils.visualize import show_current_images
    rng = np.random.default_rng(0)
    B, sz = 2, 12
    vol = lambda: rng.normal(size=(B, 1, sz, sz, sz)).astype(np.float32)
    phi = rng.normal(size=(B, 3, sz, sz, sz)).astype(np.float32) * 0.1
    extra = rng.normal(size=(B, 1, sz, sz, sz)).astype(np.float32)
    byname, byiter = str(tmp_path / "byname"), str(tmp_path / "byiter")
    show_current_images(
        3, iS=vol(), iT=vol(), iW=vol(), iSL=vol(), iTL=vol(), iWL=vol(),
        phiWarped=phi, vizImages=extra, vizName="flow",
        extraImages=extra, extraName="atten",
        visual_param={"save_fig": True, "save_fig_num": 2,
                      "pair_name": ["a", "b"], "iter": "val_iter_000003",
                      "save_fig_path_byname": byname,
                      "save_fig_path_byiter": byiter})
    import os
    assert os.path.exists(os.path.join(byname, "a_val_iter_000003.png"))
    assert os.path.exists(os.path.join(byiter, "val_iter_000003_b.png"))


def test_show_current_images_1d(tmp_path):
    """1D inputs route to the line-plot panel (reference
    ``_show_current_images_1d:21-85``)."""
    from liftreg_tpu.utils.visualize import show_current_images
    rng = np.random.default_rng(1)
    B, n = 2, 48
    sig = lambda: rng.normal(size=(B, 1, n)).astype(np.float32)
    byname, byiter = str(tmp_path / "byname"), str(tmp_path / "byiter")
    show_current_images(
        1, iS=sig(), iT=sig(), iW=sig(),
        phiWarped=rng.normal(size=(B, 1, n)).astype(np.float32),
        vizImages=sig(), vizName="v",
        visual_param={"save_fig": True, "save_fig_num": 2,
                      "pair_name": ["a", "b"], "iter": "val_iter_000001",
                      "save_fig_path_byname": byname,
                      "save_fig_path_byiter": byiter})
    import os
    assert os.path.exists(os.path.join(byname, "a_val_iter_000001.png"))
    assert os.path.exists(os.path.join(byiter, "val_iter_000001_b.png"))


def test_fused_pipeline_small():
    from liftreg_tpu.pipeline import RegistrationPipeline
    sz, latent = 32, 4
    rng = np.random.default_rng(0)
    pipe = RegistrationPipeline((sz, sz, sz), latent_dim=latent, n_proj=2)
    pca = {"vectors": jnp.asarray(
        rng.normal(size=(latent, 3 * sz ** 3)).astype(np.float32) * 0.01),
        "mean": jnp.zeros((3 * sz ** 3,), jnp.float32)}
    params = pipe.init_params(jax.random.PRNGKey(0), pca)
    src = jnp.asarray(rng.uniform(-1000, 0, (1, 1, sz, sz, sz))
                      .astype(np.float32))
    tgt = jnp.asarray(rng.uniform(-1000, 0, (1, 1, sz, sz, sz))
                      .astype(np.float32))
    warped, phi = pipe.register(params, pca, src, tgt)
    assert warped.shape == (1, 1, sz, sz, sz)
    assert phi.shape == (1, 3, sz, sz, sz)
    assert np.isfinite(np.asarray(warped)).all()


def test_fused_pipeline_mesh_sharded_serving():
    """Mesh-sharded serving: the pipeline built with a mesh (shard_mapped
    warp, batch sharded over the data axis) must match the unsharded
    pipeline on the same inputs. Tolerance is float-epsilon, not bitwise:
    per-shard programs tile/fuse differently than the B=8 program
    (measured max delta 3.2e-6 on the warped image, 1.2e-7 on phi)."""
    from liftreg_tpu.parallel import make_mesh, batch_sharding
    from liftreg_tpu.pipeline import RegistrationPipeline

    sz, latent = 16, 4
    mesh = make_mesh()
    assert mesh.devices.size == 8  # forced CPU mesh (conftest)
    B = mesh.devices.size
    rng = np.random.default_rng(1)
    pca = {"vectors": jnp.asarray(
        rng.normal(size=(latent, 3 * sz ** 3)).astype(np.float32) * 0.01),
        "mean": jnp.zeros((3 * sz ** 3,), jnp.float32)}
    src = jnp.asarray(rng.uniform(-1000, 0, (B, 1, sz, sz, sz))
                      .astype(np.float32))
    tgt = jnp.asarray(rng.uniform(-1000, 0, (B, 1, sz, sz, sz))
                      .astype(np.float32))
    seg = jnp.ones((B, 1, sz, sz, sz), jnp.float32)

    ref_pipe = RegistrationPipeline((sz, sz, sz), latent_dim=latent,
                                    n_proj=2)
    params = ref_pipe.init_params(jax.random.PRNGKey(0), pca)
    w_ref, phi_ref = ref_pipe.register(params, pca, src, tgt, seg, seg)

    pipe = RegistrationPipeline((sz, sz, sz), latent_dim=latent, n_proj=2,
                                mesh=mesh)
    shard = batch_sharding(mesh)
    src_s, tgt_s, seg_s = (jax.device_put(x, shard) for x in (src, tgt, seg))
    w, phi = pipe.register(params, pca, src_s, tgt_s, seg_s, seg_s)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(phi), np.asarray(phi_ref),
                               atol=1e-6)


def test_pipeline_mask_ct_off_ignores_segs():
    """mask_ct=False must serve the raw-CT pair: segs can't change the
    warp input (regression for the export tool dropping model.mask_ct)."""
    from liftreg_tpu.pipeline import RegistrationPipeline

    sz, latent = 16, 4
    rng = np.random.default_rng(5)
    pca = {"vectors": jnp.asarray(
        rng.normal(size=(latent, 3 * sz ** 3)).astype(np.float32) * 0.01),
        "mean": jnp.zeros((3 * sz ** 3,), jnp.float32)}
    src = jnp.asarray(rng.uniform(-1000, 0, (1, 1, sz, sz, sz))
                      .astype(np.float32))
    tgt = jnp.asarray(rng.uniform(-1000, 0, (1, 1, sz, sz, sz))
                      .astype(np.float32))
    ones = jnp.ones((1, 1, sz, sz, sz), jnp.float32)
    half = ones.at[:, :, :8].set(0.0)

    raw = RegistrationPipeline((sz, sz, sz), latent_dim=latent, n_proj=2,
                               mask_ct=False)
    params = raw.init_params(jax.random.PRNGKey(0), pca)
    w_ones, _ = raw.register(params, pca, src, tgt, ones, ones)
    w_half, _ = raw.register(params, pca, src, tgt, half, half)
    np.testing.assert_array_equal(np.asarray(w_ones), np.asarray(w_half))

    masked = RegistrationPipeline((sz, sz, sz), latent_dim=latent, n_proj=2)
    w_m, _ = masked.register(params, pca, src, tgt, half, half)
    assert np.abs(np.asarray(w_m) - np.asarray(w_half)).max() > 1e-3


def test_pipeline_mesh_and_refine_compose():
    """mesh + refine_steps together: the refiner's warp gets the mesh
    (regression: it used to rebuild the warp unsharded) and the result
    matches the single-device refined pipeline to float epsilon."""
    from liftreg_tpu.parallel import make_mesh, batch_sharding
    from liftreg_tpu.pipeline import RegistrationPipeline

    sz, latent = 16, 4
    mesh = make_mesh()
    B = mesh.devices.size
    rng = np.random.default_rng(6)
    pca = {"vectors": jnp.asarray(
        rng.normal(size=(latent, 3 * sz ** 3)).astype(np.float32) * 0.01),
        "mean": jnp.zeros((3 * sz ** 3,), jnp.float32)}
    src = jnp.asarray(rng.uniform(-1000, 0, (B, 1, sz, sz, sz))
                      .astype(np.float32))
    tgt = jnp.asarray(rng.uniform(-1000, 0, (B, 1, sz, sz, sz))
                      .astype(np.float32))
    seg = jnp.ones((B, 1, sz, sz, sz), jnp.float32)

    plain = RegistrationPipeline((sz, sz, sz), latent_dim=latent, n_proj=2,
                                 refine_steps=5, refine_lr=0.1)
    params = plain.init_params(jax.random.PRNGKey(0), pca)
    w_ref, phi_ref = plain.register(params, pca, src, tgt, seg, seg)

    sharded = RegistrationPipeline((sz, sz, sz), latent_dim=latent,
                                   n_proj=2, mesh=mesh, refine_steps=5,
                                   refine_lr=0.1)
    assert sharded._refiner is not None and sharded.model.mesh is mesh
    sh = batch_sharding(mesh)
    args = [jax.device_put(x, sh) for x in (src, tgt, seg, seg)]
    w, phi = sharded.register(params, pca, *args)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(phi), np.asarray(phi_ref),
                               atol=1e-5)
