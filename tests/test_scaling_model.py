"""Validates the v5e-8 scaling model of DESIGN.md section 5.

The analytic claim: data-parallel training all-reduces exactly the gradient
bytes (one all-reduce pass over the 3.55 M f32 parameters at production
scale) and nothing else per step — the PCA basis and the lifted volumes
never cross ICI. Verified here structurally on the 8-device CPU mesh by
compiling the production train step and summing the bytes of every
``all-reduce`` in the optimized HLO.
"""
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "f64": 8, "s32": 4,
                "u32": 4, "pred": 1, "s8": 1, "u8": 1}


def _allreduce_bytes(hlo_text):
    """Sum output bytes of all-reduce ops in optimized HLO text."""
    total = 0
    n = 0
    for line in hlo_text.splitlines():
        if "all-reduce(" not in line or "=" not in line:
            continue
        # '%all-reduce.21 = (f32[16]{0}, ..., /*index=5*/f32[...], ...)
        #  all-reduce(...)': take the full output-type part (careful: the
        # tuple contains '=' inside /*index=N*/ comments)
        lhs = line.split(" all-reduce(")[0]
        lhs = lhs.split("=", 1)[1]
        for m in re.finditer(r"(\w+)\[([\d,]*)\]", lhs):
            dt, dims = m.group(1), m.group(2)
            if dt not in _DTYPE_BYTES:
                continue
            elems = 1
            for d in dims.split(","):
                if d:
                    elems *= int(d)
            total += elems * _DTYPE_BYTES[dt]
            n += 1
    return total, n


def test_train_step_allreduces_exactly_the_gradients():
    import jax
    import jax.numpy as jnp
    import optax

    import __graft_entry__ as g
    from liftreg_tpu.losses import SubspaceLoss
    from liftreg_tpu.models import LiftRegSubspaceBackproj
    from liftreg_tpu.parallel import mesh as mesh_lib

    n_dev = len(jax.devices())
    assert n_dev == 8
    sz, latent, n_proj = 32, 4, 2
    mesh = mesh_lib.make_mesh(n_dev)
    model = LiftRegSubspaceBackproj(img_sz=(sz, sz, sz), latent_dim=latent,
                                    drr_feature_num=n_proj, mesh=mesh)
    inputs, pca = g._example_inputs(sz=sz, n_proj=n_proj, latent=latent,
                                    batch=n_dev, proj_res=48)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), inputs, pca)
    loss_obj = SubspaceLoss({"sim_class": "ncc"})
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    inputs = mesh_lib.shard_batch(inputs, mesh)
    rep = mesh_lib.replicated(mesh)
    pca = {k: jax.device_put(v, rep) for k, v in pca.items()}
    params = jax.device_put(params, rep)
    opt_state = jax.device_put(opt_state, rep)

    def train_step(params, opt_state, batch, pca):
        def loss_fn(p):
            return loss_obj(model.apply(p, batch, pca), 0.01)["total_loss"]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    compiled = jax.jit(train_step).lower(
        params, opt_state, inputs, pca).compile()
    hlo = compiled.as_text()

    param_bytes = sum(np.asarray(x).nbytes
                      for x in jax.tree_util.tree_leaves(params))
    ar_bytes, n_ar = _allreduce_bytes(hlo)
    assert n_ar > 0, "no all-reduce found — batch not actually sharded?"
    # every gradient crosses ICI exactly once; the loss scalar may add a
    # few extra bytes, and XLA may pad/fuse, so allow a small overhead
    assert param_bytes <= ar_bytes <= 1.1 * param_bytes + 4096, (
        f"all-reduce bytes {ar_bytes} vs param bytes {param_bytes}")
    # the big replicated operands must NOT be all-reduced: the PCA basis
    # alone is latent*3*sz^3 floats >> grads at production scale
    pca_bytes = sum(np.asarray(x).nbytes for x in pca.values())
    assert ar_bytes < pca_bytes + param_bytes
