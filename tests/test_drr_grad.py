"""Differentiability of the projector/backprojector (BASELINE config 4:
differentiable N-view backprojection, including non-160 resolutions)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from liftreg_tpu.ops import drr


def test_backproject_differentiable_and_matches_fd():
    sz, P = 12, 2
    rng = np.random.default_rng(0)
    poses = drr.synthesize_poses(30.0, P, sz)
    proj = jnp.asarray(rng.uniform(0, 2, (1, P, 18, 18)).astype(np.float32))

    def loss(p):
        return jnp.mean(drr.backproject(p, poses, (sz, sz, sz)) ** 2)

    g = jax.grad(loss)(proj)
    assert np.isfinite(np.asarray(g)).all()
    # finite-difference check on one entry
    eps = 1e-2
    delta = jnp.zeros_like(proj).at[0, 0, 9, 9].set(eps)
    fd = (float(loss(proj + delta)) - float(loss(proj - delta))) / (2 * eps)
    assert float(g[0, 0, 9, 9]) == pytest.approx(fd, rel=1e-2, abs=1e-5)


def test_project_differentiable_wrt_volume():
    sz, P = 10, 2
    rng = np.random.default_rng(1)
    poses = drr.synthesize_poses(20.0, P, sz)
    vol = jnp.asarray(rng.uniform(0, 0.4, (sz, sz, sz)).astype(np.float32))

    def loss(v):
        return jnp.sum(drr.project(v, poses, (15, 15), (2.2, 2.2, 2.2)))

    g = jax.grad(loss)(vol)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.max(jnp.abs(g))) > 0


def test_backproject_nonstandard_resolution():
    # 192^3-style feature volumes scale without code changes (tiny analog)
    poses = drr.synthesize_poses(30.0, 3, 20)
    proj = jnp.ones((1, 3, 30, 30), jnp.float32)
    out = drr.backproject(proj, poses, (24, 20, 28))
    assert out.shape == (1, 3, 24, 20, 28)
    assert np.isfinite(np.asarray(out)).all()
