"""AOT serving artifact: export -> single file -> load -> register.

The artifact must reproduce the live pipeline exactly (same program, same
weights), pad partial batches, and load without touching the model source
(no pipeline/model construction on the serving side).
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from liftreg_tpu.pipeline import RegistrationPipeline
from liftreg_tpu.serving import ARTIFACT_VERSION, ServingModel, export_serving

SZ, LATENT, B = 16, 8, 2


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    pipe = RegistrationPipeline((SZ, SZ, SZ), latent_dim=LATENT)
    keys = jax.random.split(jax.random.PRNGKey(7), 5)
    pca = {
        "vectors": jax.random.normal(keys[0], (LATENT, 3 * SZ ** 3),
                                     jnp.float32) * 0.01,
        "mean": jax.random.normal(keys[1], (3 * SZ ** 3,),
                                  jnp.float32) * 0.01,
    }
    params = pipe.init_params(keys[2], pca)
    src = jax.random.uniform(keys[3], (B, 1, SZ, SZ, SZ), jnp.float32,
                             -1000.0, 0.0)
    tgt = jax.random.uniform(keys[4], (B, 1, SZ, SZ, SZ), jnp.float32,
                             -1000.0, 0.0)
    seg = jnp.ones((B, 1, SZ, SZ, SZ), jnp.float32)
    path = str(tmp_path_factory.mktemp("serving") / "flagship.liftreg")
    # CPU-only export in the test env (conftest forces the cpu platform;
    # production exports default to ("tpu", "cpu"))
    export_serving(pipe, params, pca, batch_size=B, out_path=path,
                   platforms=("cpu",))
    return {"path": path, "pipe": pipe, "params": params, "pca": pca,
            "src": src, "tgt": tgt, "seg": seg}


def test_artifact_matches_live_pipeline(artifact):
    a = artifact
    srv = ServingModel.load(a["path"])
    w_live, phi_live = a["pipe"].register(a["params"], a["pca"], a["src"],
                                          a["tgt"], a["seg"], a["seg"])
    w_srv, phi_srv = srv.register(a["src"], a["tgt"], a["seg"], a["seg"])
    np.testing.assert_array_equal(np.asarray(w_live), np.asarray(w_srv))
    np.testing.assert_array_equal(np.asarray(phi_live), np.asarray(phi_srv))


def test_partial_batch_padded_and_sliced(artifact):
    a = artifact
    srv = ServingModel.load(a["path"])
    w_full, phi_full = srv.register(a["src"], a["tgt"], a["seg"], a["seg"])
    w_one, phi_one = srv.register(a["src"][:1], a["tgt"][:1], a["seg"][:1],
                                  a["seg"][:1])
    assert w_one.shape[0] == 1 and phi_one.shape[0] == 1
    # element 0 of a padded batch equals element 0 of the full batch: the
    # fused program has no cross-batch coupling
    np.testing.assert_allclose(np.asarray(w_one[0]), np.asarray(w_full[0]),
                               atol=1e-6)
    with pytest.raises(ValueError, match="outside"):
        srv.register(jnp.concatenate([a["src"], a["src"]]), a["tgt"])


def test_default_segs_are_ones(artifact):
    a = artifact
    srv = ServingModel.load(a["path"])
    w_none, _ = srv.register(a["src"], a["tgt"])
    w_ones, _ = srv.register(a["src"], a["tgt"], a["seg"], a["seg"])
    np.testing.assert_array_equal(np.asarray(w_none), np.asarray(w_ones))


def test_loader_needs_no_model_source(artifact, monkeypatch):
    """The serving side must not construct the pipeline or model."""
    import liftreg_tpu.pipeline as pipeline_mod

    def _boom(*a, **k):
        raise AssertionError("serving load constructed the pipeline")

    monkeypatch.setattr(pipeline_mod.RegistrationPipeline, "__init__", _boom)
    srv = ServingModel.load(artifact["path"])
    w, phi = srv.register(artifact["src"], artifact["tgt"])
    assert w.shape[0] == B and np.isfinite(np.asarray(phi)).all()


def test_version_gate_v1(artifact, tmp_path):
    from flax import serialization

    from liftreg_tpu.serving import read_artifact

    payload = read_artifact(artifact["path"])
    payload = {"version": ARTIFACT_VERSION + 99,
               "exported": payload["exported"],
               "params": payload["params"], "pca": payload["pca"],
               "meta": payload["meta"]}
    bad = tmp_path / "bad.liftreg"
    bad.write_bytes(serialization.msgpack_serialize(payload))
    with pytest.raises(ValueError, match="version"):
        ServingModel.load(str(bad))


def test_version_gate_v2(artifact, tmp_path):
    """Corrupting the v2 header's version field must be caught."""
    import struct

    from flax import serialization

    from liftreg_tpu.serving import _MAGIC_V2

    raw = bytearray(open(artifact["path"], "rb").read())
    assert raw[:len(_MAGIC_V2)] == _MAGIC_V2  # default export is v2
    hlen = struct.unpack(
        "<Q", raw[len(_MAGIC_V2):len(_MAGIC_V2) + 8])[0]
    hdr = serialization.msgpack_restore(
        bytes(raw[len(_MAGIC_V2) + 8:len(_MAGIC_V2) + 8 + hlen]))
    hdr["version"] = 99
    new_hdr = serialization.msgpack_serialize(hdr)
    # same-length header keeps every section offset valid
    assert len(new_hdr) == hlen
    raw[len(_MAGIC_V2) + 8:len(_MAGIC_V2) + 8 + hlen] = new_hdr
    bad = tmp_path / "bad2.liftreg"
    bad.write_bytes(bytes(raw))
    with pytest.raises(ValueError, match="version"):
        ServingModel.load(str(bad))


def test_v1_export_roundtrip_and_format_parity(artifact, tmp_path):
    """artifact_format=1 still writes a loadable legacy artifact whose
    weights and program bytes equal the v2 export's."""
    from liftreg_tpu.serving import read_artifact

    a = artifact
    v1 = str(tmp_path / "legacy.liftreg")
    export_serving(a["pipe"], a["params"], a["pca"], batch_size=B,
                   out_path=v1, platforms=("cpu",), artifact_format=1)
    p1, p2 = read_artifact(v1), read_artifact(a["path"])
    assert p1["version"] == 1 and p2["version"] == 2
    # (exported bytes are NOT compared: two jax_export.export runs of the
    # same program are behaviorally identical but not byte-identical)
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x),
                                                   np.asarray(y)),
        p1["params"], p2["params"])
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x),
                                                   np.asarray(y)),
        p1["pca"], p2["pca"])
    w1, _ = ServingModel.load(v1).register(a["src"], a["tgt"])
    w2, _ = ServingModel.load(a["path"]).register(a["src"], a["tgt"])
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))


def test_v2_arrays_are_zero_copy_views(artifact):
    """v2 weights must be read-only buffer views (no decode copy) with
    64-byte-aligned sections, including bf16 leaves by dtype name."""
    from liftreg_tpu.serving import read_artifact

    payload = read_artifact(artifact["path"])
    leaves = jax.tree_util.tree_leaves(payload["params"]) + \
        jax.tree_util.tree_leaves(payload["pca"])
    assert leaves
    for leaf in leaves:
        assert isinstance(leaf, np.ndarray)
        assert not leaf.flags.writeable  # frombuffer view, not a copy
        assert leaf.base is not None


@pytest.mark.slow  # ~13s: full re-export on the 1-core CPU
def test_v2_preserves_bf16_leaves(tmp_path):
    """A bf16 PCA basis (the production serving config) must round-trip
    through the v2 dtype-name descriptors."""
    pipe = RegistrationPipeline((SZ, SZ, SZ), latent_dim=LATENT,
                                compute_dtype=jnp.bfloat16)
    keys = jax.random.split(jax.random.PRNGKey(5), 3)
    pca = {"vectors": (jax.random.normal(keys[0], (LATENT, 3 * SZ ** 3),
                                         jnp.float32) * 0.01
                       ).astype(jnp.bfloat16),
           "mean": jnp.zeros((3 * SZ ** 3,), jnp.float32)}
    params = pipe.init_params(keys[1], pca)
    path = str(tmp_path / "bf16.liftreg")
    export_serving(pipe, params, pca, batch_size=1, out_path=path,
                   platforms=("cpu",))
    from liftreg_tpu.serving import read_artifact
    restored = read_artifact(path)["pca"]
    assert restored["vectors"].dtype == np.asarray(pca["vectors"]).dtype
    np.testing.assert_array_equal(np.asarray(restored["vectors"]),
                                  np.asarray(pca["vectors"]))
    srv = ServingModel.load(path)
    src = jax.random.uniform(keys[2], (1, 1, SZ, SZ, SZ), jnp.float32,
                             -1000.0, 0.0)
    w, phi = srv.register(src, src)
    assert np.isfinite(np.asarray(w)).all()


def test_meta_recorded(artifact):
    srv = ServingModel.load(artifact["path"])
    assert srv.meta["img_sz"] == [SZ, SZ, SZ]
    assert srv.batch_size == B
    assert srv.platforms == ("cpu",)


@pytest.mark.slow  # ~13s: re-export + reload on the 1-core CPU
def test_multiplatform_artifact_serves_on_cpu(tmp_path):
    """A ("tpu", "cpu") artifact — the production default — must lower for
    both platforms from a CPU export host and still serve on CPU."""
    pipe = RegistrationPipeline((SZ, SZ, SZ), latent_dim=LATENT)
    keys = jax.random.split(jax.random.PRNGKey(3), 3)
    pca = {"vectors": jax.random.normal(keys[0], (LATENT, 3 * SZ ** 3),
                                        jnp.float32) * 0.01,
           "mean": jnp.zeros((3 * SZ ** 3,), jnp.float32)}
    params = pipe.init_params(keys[1], pca)
    path = str(tmp_path / "multi.liftreg")
    export_serving(pipe, params, pca, batch_size=1, out_path=path,
                   platforms=("tpu", "cpu"))
    srv = ServingModel.load(path)
    assert srv.platforms == ("tpu", "cpu")
    src = jax.random.uniform(keys[2], (1, 1, SZ, SZ, SZ), jnp.float32,
                             -1000.0, 0.0)
    w, phi = srv.register(src, src)
    assert np.isfinite(np.asarray(w)).all()
    assert phi.shape == (1, 3, SZ, SZ, SZ)


@pytest.mark.slow  # ~15s: refinement serve on the 1-core CPU
def test_refined_artifact_beats_unrefined(artifact, tmp_path):
    """A pipeline with refine_steps exports the fused refinement loop too;
    the refined artifact must beat the plain one's masked-pair NCC."""
    from liftreg_tpu.losses.similarity import ncc_loss
    from liftreg_tpu.models.subspace_backproj import mask_lung
    from liftreg_tpu.pipeline import normalize_hu

    a = artifact
    pipe_r = RegistrationPipeline((SZ, SZ, SZ), latent_dim=LATENT,
                                  refine_steps=25, refine_lr=0.1)
    path = str(tmp_path / "refined.liftreg")
    export_serving(pipe_r, a["params"], a["pca"], batch_size=B,
                   out_path=path, platforms=("cpu",))
    srv_r = ServingModel.load(path)
    assert srv_r.meta["refine_steps"] == 25

    srv0 = ServingModel.load(a["path"])
    assert srv0.meta["refine_steps"] == 0
    w0, _ = srv0.register(a["src"], a["tgt"], a["seg"], a["seg"])
    w1, _ = srv_r.register(a["src"], a["tgt"], a["seg"], a["seg"])
    target_cp = mask_lung(normalize_hu(a["tgt"]), a["seg"])
    assert float(ncc_loss(w1, target_cp)) < float(ncc_loss(w0, target_cp))


@pytest.mark.slow  # ~17s: projection-entry re-trace on the 1-core CPU
def test_projection_entry_artifact(artifact, tmp_path):
    """entry='register_projections': the CT-free artifact (projection
    refinement baked in) matches the live pipeline and rejects the wrong
    entry point."""
    from liftreg_tpu.ops import drr

    a = artifact
    pipe = RegistrationPipeline((SZ, SZ, SZ), latent_dim=LATENT,
                                refine_steps=8, refine_lr=0.1,
                                refine_domain="projection")
    path = str(tmp_path / "ctfree.liftreg")
    export_serving(pipe, a["params"], a["pca"], batch_size=B,
                   out_path=path, platforms=("cpu",),
                   entry="register_projections")
    srv = ServingModel.load(path)
    assert srv.entry == "register_projections"
    assert srv.meta["refine_steps"] == 8

    att = drr.calc_relative_atten_coef(a["tgt"][:, 0])
    proj = jnp.clip(drr.project(att, jnp.asarray(pipe.poses),
                                pipe.resolution, pipe.spacing),
                    0.0, 6.0) / 6.0 * 2.0 - 1.0
    w_live, phi_live = pipe.register_projections(a["params"], a["pca"],
                                                 a["src"], proj, a["seg"])
    w_srv, phi_srv = srv.register_projections(a["src"], proj, a["seg"])
    np.testing.assert_array_equal(np.asarray(w_live), np.asarray(w_srv))
    np.testing.assert_array_equal(np.asarray(phi_live), np.asarray(phi_srv))

    # partial batch works; wrong entry and wrong proj shape are rejected
    w1, _ = srv.register_projections(a["src"][:1], proj[:1], a["seg"][:1])
    assert w1.shape[0] == 1
    with pytest.raises(ValueError, match="entry"):
        srv.register(a["src"], a["tgt"])
    with pytest.raises(ValueError, match="target_proj"):
        srv.register_projections(a["src"], proj[:, :, :4])
    srv0 = ServingModel.load(a["path"])
    with pytest.raises(ValueError, match="entry"):
        srv0.register_projections(a["src"], proj)


@pytest.mark.slow  # ~10s: subprocess CLI serve on the 1-core CPU
def test_serve_batch_cli(artifact, tmp_path):
    """tools/serve_batch.py: 3 cases through a B=2 artifact (one full +
    one partial dispatch); outputs match direct ServingModel calls."""
    import subprocess
    import sys as _sys
    from pathlib import Path

    repo = str(Path(__file__).resolve().parent.parent)
    inp, out = tmp_path / "cases", tmp_path / "out"
    inp.mkdir()
    rng = np.random.default_rng(11)
    vols = {}
    for cid in ("case1", "case2", "case3"):
        s = rng.uniform(-1000, 0, (SZ, SZ, SZ)).astype(np.float32)
        t = rng.uniform(-1000, 0, (SZ, SZ, SZ)).astype(np.float32)
        np.save(inp / f"{cid}_source.npy", s)
        np.save(inp / f"{cid}_target.npy", t)
        vols[cid] = (s, t)
    proc = subprocess.run(
        [_sys.executable, os.path.join(repo, "tools", "serve_batch.py"),
         "-a", artifact["path"], "-i", str(inp), "-o", str(out)],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": repo})
    assert proc.returncode == 0, proc.stderr[-2000:]

    srv = ServingModel.load(artifact["path"])
    for cid, (s, t) in vols.items():
        w = np.load(out / f"{cid}_warped.npy")
        phi = np.load(out / f"{cid}_phi.npy")
        assert w.shape == (1, SZ, SZ, SZ) and phi.shape == (3, SZ, SZ, SZ)
        w_ref, phi_ref = srv.register(jnp.asarray(s)[None, None],
                                      jnp.asarray(t)[None, None])
        np.testing.assert_allclose(w, np.asarray(w_ref[0]), atol=1e-6)
        # serve_batch writes the repo-wide [0,1] _phi.npy convention
        # (io_utils.save_deformations), not the model's [-1,1] map
        np.testing.assert_allclose(phi, (np.asarray(phi_ref[0]) + 1.0) / 2.0,
                                   atol=1e-6)


@pytest.mark.slow  # ~10s: subprocess CLI serve on the 1-core CPU
def test_serve_batch_cli_projection_artifact(artifact, tmp_path):
    """serve_batch auto-detects a CT-free artifact and consumes
    <id>_target_proj.npy instead of target volumes."""
    import subprocess
    import sys as _sys
    from pathlib import Path

    from liftreg_tpu.ops import drr

    a = artifact
    pipe = RegistrationPipeline((SZ, SZ, SZ), latent_dim=LATENT)
    art = str(tmp_path / "ctfree.liftreg")
    export_serving(pipe, a["params"], a["pca"], batch_size=2,
                   out_path=art, platforms=("cpu",),
                   entry="register_projections")

    repo = str(Path(__file__).resolve().parent.parent)
    inp, out = tmp_path / "cases", tmp_path / "out"
    inp.mkdir()
    rng = np.random.default_rng(13)
    for cid in ("p1", "p2", "p3"):
        s = rng.uniform(-1000, 0, (SZ, SZ, SZ)).astype(np.float32)
        t = rng.uniform(-1000, 0, (SZ, SZ, SZ)).astype(np.float32)
        att = drr.calc_relative_atten_coef(jnp.asarray(t)[None])
        proj = jnp.clip(drr.project(att, jnp.asarray(pipe.poses),
                                    pipe.resolution, pipe.spacing),
                        0.0, 6.0) / 6.0 * 2.0 - 1.0
        np.save(inp / f"{cid}_source.npy", s)
        np.save(inp / f"{cid}_target_proj.npy", np.asarray(proj[0]))
    proc = subprocess.run(
        [_sys.executable, os.path.join(repo, "tools", "serve_batch.py"),
         "-a", art, "-i", str(inp), "-o", str(out)],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": repo})
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "entry register_projections" in proc.stdout
    for cid in ("p1", "p2", "p3"):
        phi = np.load(out / f"{cid}_phi.npy")
        assert phi.shape == (3, SZ, SZ, SZ)
        assert np.isfinite(phi).all()


@pytest.mark.slow
def test_export_cli_from_trained_experiment(tmp_path):
    """The CLI plumbing: config -> pipeline options, checkpoint -> weights.

    Trains a 1-epoch 32^3 experiment, exports with
    ``tools/export_serving.py -s``, and asserts the artifact's weights are
    byte-equal to the checkpoint's (non-circular proof that the exported
    program carries the TRAINED parameters, not a fresh init)."""
    import subprocess
    import sys as _sys
    from pathlib import Path

    from liftreg_tpu.train import RegistrationTrainer
    from liftreg_tpu.utils.checkpoint import load_checkpoint

    _sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from tools.make_synthetic_dataset import generate
    from test_train_e2e import make_setting

    data = str(tmp_path / "data")
    generate(data, n_train=4, n_val=2, n_test=2, sz=32, n_proj=2, latent=4,
             seed=0)
    exp = str(tmp_path / "exp")
    setting = make_setting(data, exp, epochs=1)
    RegistrationTrainer(setting).run()
    ckpt = os.path.join(exp, "checkpoints", "model_best.ckpt")
    assert os.path.exists(ckpt)

    # the CLI reads the full experiment config from disk, like eval_cli
    import json
    cfg_path = str(tmp_path / "cur_task_setting.json")
    with open(cfg_path, "w") as f:
        json.dump(setting, f)

    art = str(tmp_path / "trained.liftreg")
    repo = str(Path(__file__).resolve().parent.parent)
    proc = subprocess.run(
        [_sys.executable, os.path.join(repo, "tools", "export_serving.py"),
         "-s", cfg_path, "-o", art, "-b", "2", "--platforms", "cpu"],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": repo})
    assert proc.returncode == 0, proc.stderr[-2000:]

    from liftreg_tpu.serving import read_artifact
    payload = read_artifact(art)
    ckpt_params = load_checkpoint(ckpt)["params"]
    jax.tree_util.tree_map(np.testing.assert_array_equal,
                           payload["params"], ckpt_params)

    srv = ServingModel.load(art)
    assert srv.meta["img_sz"] == [32, 32, 32]
    src = jnp.full((1, 1, 32, 32, 32), -500.0, jnp.float32)
    w, phi = srv.register(src, src)
    assert np.isfinite(np.asarray(w)).all() and phi.shape[1] == 3
