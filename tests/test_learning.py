"""Regression test: the training machinery actually learns (loss descends
on a small overfit problem). Catches broken gradients / optimizer wiring."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp
import optax

from liftreg_tpu import coords
from liftreg_tpu.losses import SubspaceLoss
from liftreg_tpu.models import LiftRegSubspaceBackproj
from liftreg_tpu.ops import drr, resample
from liftreg_tpu.pca import fit_pca


def test_overfit_small_batch():
    sz, latent, P, B = 16, 3, 2, 2
    rng = np.random.default_rng(0)
    idm = coords.identity_map_np((sz, sz, sz))
    poses = drr.synthesize_poses(30.0, P, sz)
    res = drr.default_resolution((sz, sz, sz))

    zz, yy, xx = np.mgrid[0:sz, 0:sz, 0:sz].astype(np.float32)
    ct = np.where(((zz - 8) ** 2 + (yy - 8) ** 2 + (xx - 8) ** 2) < 36,
                  0.0, -1000.0) + rng.normal(scale=30, size=(sz,) * 3)

    disps, sources, targets, projs = [], [], [], []
    for _ in range(B):
        low = rng.normal(size=(4, 4, 4)).astype(np.float32) * 0.08
        disp = np.stack([np.asarray(resample.resize_trilinear(
            jnp.asarray(rng.normal(size=(4, 4, 4)).astype(np.float32) * 0.08)
            [None, None], (sz,) * 3))[0, 0] for _ in range(3)])
        disps.append(disp.reshape(-1))
        phi = jnp.asarray(idm + disp)[None]
        tgt = np.asarray(resample.warp_image(
            jnp.asarray(ct)[None, None] / 1000.0, phi, zero_boundary=False,
            scale_intensity=False))[0, 0] * 1000.0
        proj = np.asarray(drr.project(
            drr.calc_relative_atten_coef(jnp.asarray(tgt)), poses, res,
            (2.2,) * 3))
        sources.append(np.clip(ct, -1000, 0) / 1000 * 2 + 1)
        targets.append(np.clip(tgt, -1000, 0) / 1000 * 2 + 1)
        projs.append(np.clip(proj, 0, 6) / 6 * 2 - 1)

    vectors, mean = fit_pca(np.stack(disps + [d * 0.5 for d in disps]),
                            latent, scale_by_stddev=True)
    pca = {"vectors": jnp.asarray(vectors), "mean": jnp.asarray(mean)}
    inputs = {
        "source": jnp.asarray(np.stack(sources, dtype=np.float32))[:, None],
        "target": jnp.asarray(np.stack(targets, dtype=np.float32))[:, None],
        "target_proj": jnp.asarray(np.stack(projs, dtype=np.float32)),
        "target_poses": jnp.asarray(np.tile(poses, (B, 1, 1))),
        "spacing": jnp.asarray(np.tile([2.2] * 3, (B, 1)).astype(np.float32)),
    }
    model = LiftRegSubspaceBackproj(img_sz=(sz,) * 3, latent_dim=latent,
                                    drr_feature_num=P)
    params = model.init(jax.random.PRNGKey(0), inputs, pca)
    loss_obj = SubspaceLoss({"sim_class": "ncc", "initial_reg_factor": 0.01,
                             "min_reg_factor": 0.01})
    tx = optax.adam(3e-3, eps=1e-5)
    opt = tx.init(params)

    @jax.jit
    def step(p, o, batch, pca):
        def lf(pp):
            return loss_obj(model.apply(pp, batch, pca), 0.01)["total_loss"]
        loss, g = jax.value_and_grad(lf)(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, loss

    losses = []
    for _ in range(40):
        params, opt, loss = step(params, opt, inputs, pca)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9, losses[::8]
    assert np.isfinite(losses).all()
