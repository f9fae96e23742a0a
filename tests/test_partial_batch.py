"""Partial/mesh-indivisible batches on the 8-device mesh (VERDICT r1 #6).

The round-1 behavior silently *replicated* any batch whose leading dim
wasn't divisible by the mesh (8x redundant compute) and retraced the train
step on the final short batch every epoch. Now every batch is padded to one
static mesh-divisible shape, the train loader drops the remainder, and
eval metrics only cover real samples.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

pytestmark = pytest.mark.slow

from tests.test_train_e2e import make_setting  # noqa: E402


@pytest.fixture(scope="module")
def synth7(tmp_path_factory):
    from tools.make_synthetic_dataset import generate
    out = str(tmp_path_factory.mktemp("synth7"))
    # 7 train cases: with batch_size 4 the train split is 4 + (3 dropped),
    # and val (3 cases) yields a short final batch that must be padded
    generate(out, n_train=7, n_val=3, n_test=2, sz=32, n_proj=2, latent=4,
             seed=1)
    return out


def test_pad_batch_helper():
    from liftreg_tpu.parallel import mesh as mesh_lib

    batch = {"a": np.arange(3 * 5, dtype=np.float32).reshape(3, 5),
             "b": np.ones((3, 2, 2))}
    padded, nv = mesh_lib.pad_batch(batch, 8)
    assert nv == 3
    assert padded["a"].shape == (8, 5) and padded["b"].shape == (8, 2, 2)
    # pad rows repeat the final sample
    np.testing.assert_array_equal(padded["a"][3], batch["a"][2])
    np.testing.assert_array_equal(padded["a"][7], batch["a"][2])
    same, nv = mesh_lib.pad_batch(batch, 3)
    assert nv == 3 and same["a"].shape == (3, 5)
    with pytest.raises(ValueError):
        mesh_lib.pad_batch(batch, 2)


def test_pad_rows_carry_no_loss_weight():
    """With a validity mask, a batch padded by repeating the final sample
    produces the same loss as the unpadded batch (ADVICE round 2: the
    repeated sample must not get extra gradient weight)."""
    import jax.numpy as jnp

    from liftreg_tpu.losses import SubspaceLoss

    rng = np.random.default_rng(0)
    b, pad_b, sz = 3, 8, 8
    out = {
        "warped": rng.normal(size=(b, 1, sz, sz, sz)).astype(np.float32),
        "target": rng.normal(size=(b, 1, sz, sz, sz)).astype(np.float32),
        "params": rng.normal(size=(b, 3, sz, sz, sz)).astype(np.float32),
    }
    padded = {k: np.concatenate(
        [v] + [v[-1:]] * (pad_b - b), axis=0) for k, v in out.items()}
    loss = SubspaceLoss({"sim_class": "ncc"})
    weights = (jnp.arange(pad_b) < b).astype(jnp.float32)

    ref = loss({k: jnp.asarray(v) for k, v in out.items()}, 0.5)
    got = loss({k: jnp.asarray(v) for k, v in padded.items()}, 0.5,
               weights=weights)
    for k in ref:
        np.testing.assert_allclose(float(got[k]), float(ref[k]), rtol=1e-5)
    # and without the mask the padded loss is biased (sanity that the test
    # actually discriminates)
    biased = loss({k: jnp.asarray(v) for k, v in padded.items()}, 0.5)
    assert abs(float(biased["total_loss"]) - float(ref["total_loss"])) > 1e-6


def test_seven_samples_on_eight_device_mesh(synth7, tmp_path):
    import jax

    from liftreg_tpu.train import RegistrationTrainer

    assert len(jax.devices()) == 8  # conftest forces the virtual CPU mesh

    exp = str(tmp_path / "exp7")
    os.makedirs(exp, exist_ok=True)
    setting = make_setting(synth7, exp, epochs=2)
    setting["dataset"]["max_num_for_loading"] = [7, 3, 2, 2]
    setting["train"]["dataloader"]["batch_size"] = 4
    setting["train"]["val_frequency"] = 1

    trainer = RegistrationTrainer(setting)
    assert trainer.mesh.devices.size == 8
    # train loader drops the partial batch: 7 -> one batch of 4
    assert len(trainer.loaders["train"]) == 1

    # every train/val batch must be sharded on the mesh, never replicated
    orig_set_input = trainer.set_input

    from liftreg_tpu.parallel.mesh import _REPLICATED_KEYS

    def checked_set_input(data, epoch):
        batch, names = orig_set_input(data, epoch)
        for k, v in batch.items():
            if k in _REPLICATED_KEYS:
                # batch-constant keys replicate by design (poses/spacing):
                # sharding them forces volume-shaped collectives
                # (tests/test_scaling_model.py)
                assert v.sharding.is_fully_replicated, f"{k} not replicated"
                continue
            assert v.shape[0] % 8 == 0, (k, v.shape)
            shards = {s.device for s in v.addressable_shards}
            assert len(shards) == 8, f"{k} not spread over the mesh"
            assert not v.sharding.is_fully_replicated, f"{k} replicated"
        return batch, names

    trainer.set_input = checked_set_input
    trainer.run()

    # one static shape -> the train step traced exactly once across epochs
    assert trainer._train_step._cache_size() == 1
    assert trainer._eval_step._cache_size() == 1

    # val ran over all 3 val cases despite padding to 8
    import json
    lines = [json.loads(l) for l in
             open(os.path.join(exp, "logs", "metrics.jsonl"))]
    assert any(l["tag"] == "Val_metrics/score" for l in lines)
    scores = [l["value"] for l in lines if l["tag"] == "Val_metrics/score"]
    assert all(np.isfinite(s) for s in scores)
