"""Multi-device data-parallel paths on the 8-device CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8  # conftest forces the virtual CPU mesh


def test_shard_batch_layout():
    from liftreg_tpu.parallel import make_mesh, shard_batch
    mesh = make_mesh()
    batch = {
        "source": np.zeros((8, 1, 4, 4, 4), np.float32),
        "target_poses": np.zeros((2, 3), np.float32),  # not divisible -> repl
    }
    sharded = shard_batch(batch, mesh)
    src_sharding = sharded["source"].sharding
    # batch axis split over 8 devices
    assert src_sharding.shard_shape(sharded["source"].shape)[0] == 1
    poses_sharding = sharded["target_poses"].sharding
    assert poses_sharding.shard_shape(sharded["target_poses"].shape) == (2, 3)


# full trainer dryrun (~90s on the 1-core CPU mesh); the driver runs the
# real dryrun_multichip(8) every round — keep it out of the fast suite
@pytest.mark.slow
def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as g
    g.dryrun_multichip(4)


def test_data_parallel_grads_match_single_device():
    """A sharded train step must produce the same loss/grads as unsharded."""
    import optax
    from liftreg_tpu.losses import SubspaceLoss
    from liftreg_tpu.models import LiftRegSubspace
    from liftreg_tpu.parallel import make_mesh, replicated, shard_batch

    sz, latent, P, B = 16, 2, 2, 8
    rng = np.random.default_rng(0)
    model = LiftRegSubspace(img_sz=(sz, sz, sz), latent_dim=latent,
                            drr_feature_num=P)
    inputs = {
        "source": jnp.asarray(rng.uniform(-1, 1, (B, 1, sz, sz, sz))
                              .astype(np.float32)),
        "target": jnp.asarray(rng.uniform(-1, 1, (B, 1, sz, sz, sz))
                              .astype(np.float32)),
        "target_proj": jnp.asarray(rng.uniform(-1, 1, (B, P, 24, 24))
                                   .astype(np.float32)),
    }
    pca = {"vectors": jnp.asarray(rng.normal(size=(latent, 3 * sz ** 3))
                                  .astype(np.float32) * 0.01),
           "mean": jnp.zeros((3 * sz ** 3,), jnp.float32)}
    params = model.init(jax.random.PRNGKey(0), inputs, pca)
    loss_obj = SubspaceLoss({"sim_class": "ncc"})

    def loss_fn(p, batch):
        return loss_obj(model.apply(p, batch, pca), 0.01)["total_loss"]

    loss_fn_g = jax.jit(jax.value_and_grad(loss_fn))
    loss_single, grads_single = loss_fn_g(params, inputs)

    mesh = make_mesh()
    sharded = shard_batch(inputs, mesh)
    params_r = jax.device_put(params, replicated(mesh))
    loss_sharded, grads_sharded = loss_fn_g(params_r, sharded)

    assert float(loss_sharded) == pytest.approx(float(loss_single), rel=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(grads_single),
                    jax.tree_util.tree_leaves(grads_sharded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


def test_general_get_class_and_utils():
    from liftreg_tpu.models import LiftRegSubspaceBackproj
    from liftreg_tpu.utils.general import get_class, lift_to_dimension, t2np
    assert get_class(
        "liftreg.models.LiftRegDeformSubspaceBackproj.model") \
        is LiftRegSubspaceBackproj
    assert get_class("os.path.join") is not None  # dotted-path fallback
    assert lift_to_dimension(np.zeros((3, 4)), 4).shape == (1, 1, 3, 4)
    assert t2np(jnp.ones(3)).shape == (3,)
