"""Model smoke tests at small scale (CPU): shapes, output contract, grads."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from liftreg_tpu.models import (LiftRegSubspace, LiftRegSubspaceBackproj,
                                RegNet2D3D, get_model)
from liftreg_tpu.ops import drr


def make_inputs(rng, B=2, P=4, sz=32, proj=48, with_labels=True,
                with_original=False):
    D = W = H = sz
    inputs = {
        "source": jnp.asarray(rng.uniform(-1, 1, (B, 1, D, W, H)).astype(np.float32)),
        "target": jnp.asarray(rng.uniform(-1, 1, (B, 1, D, W, H)).astype(np.float32)),
        "target_proj": jnp.asarray(rng.uniform(-1, 1, (B, P, proj, proj)).astype(np.float32)),
        "target_poses": jnp.asarray(np.tile(drr.synthesize_poses(30.0, P, W), (B, 1, 1))),
        "spacing": jnp.asarray(np.tile([2.2, 2.2, 2.2], (B, 1)).astype(np.float32)),
    }
    if with_labels:
        inputs["source_label"] = jnp.asarray(
            (rng.uniform(size=(B, 1, D, W, H)) > 0.5).astype(np.float32))
        inputs["target_label"] = jnp.asarray(
            (rng.uniform(size=(B, 1, D, W, H)) > 0.5).astype(np.float32))
    if with_original:
        inputs["original_source"] = jnp.asarray(
            rng.uniform(0, 0.4, (B, 1, D, W, H)).astype(np.float32))
    return inputs


def make_pca(rng, latent, sz):
    n = 3 * sz ** 3
    return {
        "vectors": jnp.asarray(rng.normal(size=(latent, n)).astype(np.float32) * 0.01),
        "mean": jnp.asarray(rng.normal(size=(n,)).astype(np.float32) * 0.01),
    }


@pytest.mark.parametrize("cls", [LiftRegSubspaceBackproj, LiftRegSubspace])
def test_subspace_models_forward(cls):
    rng = np.random.default_rng(0)
    sz, latent = 32, 8
    model = cls(img_sz=(sz, sz, sz), latent_dim=latent, drr_feature_num=4)
    inputs = make_inputs(rng, sz=sz)
    pca = make_pca(rng, latent, sz)
    params = model.init(jax.random.PRNGKey(0), inputs, pca)
    out = model.apply(params, inputs, pca)
    assert out["warped"].shape == (2, 1, sz, sz, sz)
    assert out["phi"].shape == (2, 3, sz, sz, sz)
    assert out["params"].shape == (2, 3, sz, sz, sz)
    assert out["pca_coefs"].shape == (2, latent)
    assert np.isfinite(np.asarray(out["warped"])).all()
    # lung masking applied to the similarity target
    assert not np.allclose(np.asarray(out["target"]),
                           np.asarray(inputs["target"]))


def test_backproj_model_grad_flows():
    rng = np.random.default_rng(1)
    sz, latent = 16, 4
    model = LiftRegSubspaceBackproj(img_sz=(sz, sz, sz), latent_dim=latent)
    inputs = make_inputs(rng, B=1, sz=sz, proj=24)
    pca = make_pca(rng, latent, sz)
    params = model.init(jax.random.PRNGKey(0), inputs, pca)

    def loss(p):
        out = model.apply(p, inputs, pca)
        return jnp.mean((out["warped"] - inputs["target"]) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_regnet2d3d_forward():
    rng = np.random.default_rng(2)
    sz = 16  # shape-independent contract; 32^3 costs 28s on the 1-core CPU
    # inverse_iters=2: the fixed-point inverse scan's length is a compile
    # -time constant; 2 iterations exercise the same program structure
    model = RegNet2D3D(img_sz=(sz, sz, sz), drr_feature_num=4,
                       inverse_iters=2)
    inputs = make_inputs(rng, B=1, sz=sz, proj=24, with_original=True)
    params = model.init(jax.random.PRNGKey(0), inputs)
    out = model.apply(params, inputs)
    assert out["warped"].shape == (1, 1, sz, sz, sz)
    assert out["phi"].shape == (1, 3, sz, sz, sz)
    assert len(out["params"]) == 2
    assert out["warped_proj"].shape == inputs["target_proj"].shape
    assert out["source_proj"].shape == inputs["target_proj"].shape
    for k in ["warped", "warped_proj", "warped_proj_inv", "source_proj"]:
        assert np.isfinite(np.asarray(out[k])).all(), k
    # projections normalized to [-1, 1]
    wp = np.asarray(out["warped_proj"])
    assert wp.min() == pytest.approx(-1.0, abs=1e-5)
    assert wp.max() == pytest.approx(1.0, abs=1e-5)


def test_registry_aliases():
    assert get_model("liftreg.models.LiftRegDeformSubspaceBackproj.model") \
        is LiftRegSubspaceBackproj
    assert get_model("subspace_backproj") is LiftRegSubspaceBackproj
    with pytest.raises(KeyError):
        get_model("nope")


def test_encoder_fc_sizes_match_reference_at_160():
    """At 160^3 the flattened encoder output must be 32*5^3=4000
    (``LiftRegDeformSubspaceBackproj.py:34-36``) — verified structurally via
    param shapes at a scaled-down 32^3 (-> 32*1^3)."""
    rng = np.random.default_rng(3)
    sz, latent = 32, 8
    model = LiftRegSubspace(img_sz=(sz, sz, sz), latent_dim=latent)
    inputs = make_inputs(rng, B=1, sz=sz)
    pca = make_pca(rng, latent, sz)
    params = model.init(jax.random.PRNGKey(0), inputs, pca)
    flat = jax.tree_util.tree_leaves_with_path(params)
    # first FC after flatten: in = 32 * (sz/32)^3
    fc_kernels = [np.asarray(v) for k, v in flat
                  if "Dense" in jax.tree_util.keystr(k) and np.asarray(v).ndim == 2]
    in_dims = sorted(k.shape[0] for k in fc_kernels)
    assert 32 * (sz // 32) ** 3 in in_dims
    assert 800 in in_dims and 256 in in_dims


def test_backproj_mask_ct_off_uses_raw_pair():
    """mask_ct=False: sim inputs are the raw CT pair (model docstring)."""
    rng = np.random.default_rng(3)
    sz, latent = 16, 4
    inputs = make_inputs(rng, B=1, sz=sz, proj=24)
    pca = make_pca(rng, latent, sz)
    model = LiftRegSubspaceBackproj(img_sz=(sz, sz, sz), latent_dim=latent,
                                    mask_ct=False)
    params = model.init(jax.random.PRNGKey(0), inputs, pca)
    out = model.apply(params, inputs, pca)
    # target passes through unmasked; warped comes from the raw moving image
    np.testing.assert_array_equal(np.asarray(out["target"]),
                                  np.asarray(inputs["target"]))
    masked = LiftRegSubspaceBackproj(img_sz=(sz, sz, sz), latent_dim=latent)
    out_m = masked.apply(params, inputs, pca)
    assert not np.allclose(np.asarray(out["warped"]),
                           np.asarray(out_m["warped"]))


def test_subspace_ablation_mask_ct_off():
    """mask_ct=False on the no-backprojection ablation model too."""
    rng = np.random.default_rng(4)
    sz, latent = 16, 4
    inputs = make_inputs(rng, B=1, sz=sz, proj=24)
    pca = make_pca(rng, latent, sz)
    model = LiftRegSubspace(img_sz=(sz, sz, sz), latent_dim=latent,
                            mask_ct=False)
    params = model.init(jax.random.PRNGKey(0), inputs, pca)
    out = model.apply(params, inputs, pca)
    np.testing.assert_array_equal(np.asarray(out["target"]),
                                  np.asarray(inputs["target"]))


@pytest.mark.slow  # ~26s: model-level re-pin of the op-level gradient
def test_fast_vjp_model_grads_match():  # pin in test_resample (fast suite)
    """model.fast_vjp routes warps through the custom VJP; parameter
    gradients must match plain AD (subspace and RegNet2D3D families)."""
    rng = np.random.default_rng(9)
    sz, latent = 16, 4
    inputs = make_inputs(rng, B=1, sz=sz, proj=24, with_original=True)
    pca = make_pca(rng, latent, sz)

    def grads(model, *apply_args):
        params = model.init(jax.random.PRNGKey(0), *apply_args)

        def loss(p):
            out = model.apply(p, *apply_args)
            l = jnp.mean((out["warped"] - inputs["target"]) ** 2)
            if "warped_inv" in out:
                l = l + jnp.mean(out["warped_inv"] ** 2)
            return l

        return jax.grad(loss)(params)

    for kw in ({"img_sz": (sz, sz, sz), "latent_dim": latent},):
        g0 = grads(LiftRegSubspaceBackproj(**kw), inputs, pca)
        g1 = grads(LiftRegSubspaceBackproj(fast_vjp=True, **kw), inputs, pca)
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)

    # RegNet2D3D: warps wrt traced images (inverse-flow + chained warp)
    kw = {"img_sz": (sz, sz, sz), "inverse_iters": 2}
    g0 = grads(RegNet2D3D(**kw), inputs)
    g1 = grads(RegNet2D3D(fast_vjp=True, **kw), inputs)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
