"""Pallas projector kernel vs the XLA einsum path (interpret mode on CPU;
on-chip timing happens in benchmarks)."""
import numpy as np

import jax.numpy as jnp

from liftreg_tpu.ops import drr
from liftreg_tpu.ops.pallas_drr import project_with_mats_pallas


def test_pallas_projector_matches_xla():
    rng = np.random.default_rng(0)
    B, D, W, H = 2, 20, 18, 22
    vol = jnp.asarray(rng.uniform(0, 0.4, (B, D, W, H)).astype(np.float32))
    poses = drr.synthesize_poses(30.0, 3, W)
    Rx, Rz, dx = drr.forward_matrices(poses, (D, W, H), (30, 28),
                                      (2.2, 2.0, 2.4))
    want = np.asarray(drr.project_with_mats(vol, Rx, Rz, dx, plane_chunk=5))
    got = np.asarray(project_with_mats_pallas(vol, Rx, Rz, dx, plane_chunk=5,
                                              interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pallas_projector_uneven_chunk():
    rng = np.random.default_rng(1)
    vol = jnp.asarray(rng.uniform(0, 0.4, (1, 12, 13, 14)).astype(np.float32))
    poses = drr.synthesize_poses(20.0, 2, 13)
    Rx, Rz, dx = drr.forward_matrices(poses, (12, 13, 14), (18, 20),
                                      (2.2,) * 3)
    want = np.asarray(drr.project_with_mats(vol, Rx, Rz, dx, plane_chunk=4))
    got = np.asarray(project_with_mats_pallas(vol, Rx, Rz, dx, plane_chunk=4,
                                              interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pallas_backprojector_matches_xla():
    rng = np.random.default_rng(2)
    D, W, H = 16, 18, 20
    proj = jnp.asarray(rng.uniform(-1, 1, (2, 3, 24, 26)).astype(np.float32))
    poses = drr.synthesize_poses(30.0, 3, W)
    Bu, Bv = drr.backward_matrices(poses, (D, W, H), (24, 26))
    want = np.asarray(drr.backproject_with_mats(proj, Bu, Bv, plane_chunk=5))
    from liftreg_tpu.ops.pallas_drr import backproject_with_mats_pallas
    got = np.asarray(backproject_with_mats_pallas(proj, Bu, Bv,
                                                  plane_chunk=5,
                                                  interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
