"""BASELINE config 5: LNCC similarity + subspace regularization training
step, batch sharded over the 8-device mesh (v5e-8 shape, virtual here)."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp
import optax

from liftreg_tpu.losses import SubspaceLoss, lncc_loss
from liftreg_tpu.models import LiftRegSubspaceBackproj
from liftreg_tpu.ops import drr
from liftreg_tpu.parallel import make_mesh, replicated, shard_batch


def test_lncc_training_step_on_mesh():
    sz, latent, P, B = 16, 2, 2, 8
    rng = np.random.default_rng(0)
    model = LiftRegSubspaceBackproj(img_sz=(sz,) * 3, latent_dim=latent,
                                    drr_feature_num=P)
    inputs = {
        "source": jnp.asarray(rng.uniform(-1, 1, (B, 1, sz, sz, sz))
                              .astype(np.float32)),
        "target": jnp.asarray(rng.uniform(-1, 1, (B, 1, sz, sz, sz))
                              .astype(np.float32)),
        "source_label": jnp.ones((B, 1, sz, sz, sz), jnp.float32),
        "target_label": jnp.ones((B, 1, sz, sz, sz), jnp.float32),
        "target_proj": jnp.asarray(rng.uniform(-1, 1, (B, P, 24, 24))
                                   .astype(np.float32)),
        "target_poses": jnp.asarray(
            np.tile(drr.synthesize_poses(30.0, P, sz), (B, 1, 1))),
        "spacing": jnp.asarray(np.tile([2.2] * 3, (B, 1)).astype(np.float32)),
    }
    pca = {"vectors": jnp.asarray(rng.normal(size=(latent, 3 * sz ** 3))
                                  .astype(np.float32) * 0.01),
           "mean": jnp.zeros((3 * sz ** 3,), jnp.float32)}
    params = model.init(jax.random.PRNGKey(0), inputs, pca)
    loss_obj = SubspaceLoss({"sim_class": "lncc",
                             "initial_reg_factor": 0.01,
                             "min_reg_factor": 0.01})
    tx = optax.adam(1e-3, eps=1e-5)
    opt = tx.init(params)

    mesh = make_mesh()
    assert mesh.devices.size == 8
    batch = shard_batch(inputs, mesh)
    params = jax.device_put(params, replicated(mesh))
    opt = jax.device_put(opt, replicated(mesh))
    pca_r = {k: jax.device_put(v, replicated(mesh)) for k, v in pca.items()}

    @jax.jit
    def step(p, o, b, pc):
        def lf(pp):
            out = model.apply(pp, b, pc)
            losses = loss_obj(out, 0.01)
            return losses["total_loss"], losses
        (_, aux), g = jax.value_and_grad(lf, has_aux=True)(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, aux

    params, opt, aux = step(params, opt, batch, pca_r)
    total = float(aux["total_loss"])
    assert np.isfinite(total)
    assert float(aux["sim_loss"]) > 0  # lncc of random volumes
    # second step reuses the compiled program and stays finite
    params, opt, aux2 = step(params, opt, batch, pca_r)
    assert np.isfinite(float(aux2["total_loss"]))


def test_lncc_matches_perfect_and_shifted():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 1, 12, 12, 12)).astype(np.float32))
    assert float(lncc_loss(x, x, win=5)) < 0.05
    y = jnp.asarray(rng.normal(size=(1, 1, 12, 12, 12)).astype(np.float32))
    assert float(lncc_loss(x, y, win=5)) > 0.5


def test_lncc_bounded_on_near_constant_volumes():
    """The variance terms are ~3-digit cancellations; on near-constant
    windows they can come out slightly negative and (before the round-3
    clamp) drove cc^2 far past 1 — diverging LNCC training on TPU, where
    default-precision convs also truncate the inputs to bf16. The loss must
    stay in [0, 1] for any inputs."""
    rng = np.random.default_rng(2)
    # piecewise-constant "air" background with a small structured insert,
    # like a masked CT: most windows near-zero variance
    x = np.full((1, 1, 24, 24, 24), -1.0, np.float32)
    y = np.full((1, 1, 24, 24, 24), -1.0, np.float32)
    x[0, 0, 8:16, 8:16, 8:16] = rng.normal(size=(8, 8, 8)).astype(np.float32)
    y[0, 0, 8:16, 8:16, 8:16] = rng.normal(size=(8, 8, 8)).astype(np.float32)
    for a, b in [(x, x), (x, y)]:
        v = float(lncc_loss(jnp.asarray(a), jnp.asarray(b), win=9))
        assert 0.0 <= v <= 1.0 + 1e-4, v
