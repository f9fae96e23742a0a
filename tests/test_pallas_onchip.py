"""On-chip (real TPU) parity for the Pallas DRR kernels.

The interpret-mode tests (tests/test_pallas_drr.py) run everywhere; these
compile through Mosaic on real hardware and are skipped on the CPU test
mesh. Run manually with:

    JAX_PLATFORMS=axon python -m pytest tests/test_pallas_onchip.py -q
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

requires_tpu = pytest.mark.skipif(
    jax.devices()[0].platform not in ("tpu", "axon"),
    reason="needs a real TPU (run with JAX_PLATFORMS=axon)")


@requires_tpu
def test_pallas_project_onchip_production_shape():
    from liftreg_tpu.ops import drr, pallas_drr

    SZ, P, RES = 160, 4, 240
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.uniform(0, 0.05, (1, SZ, SZ, SZ))
                      .astype(np.float32))
    poses = drr.synthesize_poses(30.0, P, SZ)
    Rx, Rz, dx = drr.forward_matrices(poses, (SZ, SZ, SZ), (RES, RES),
                                      (2.2, 2.2, 2.2))
    ref = np.asarray(drr.project_with_mats(vol, Rx, Rz, dx))
    got = np.asarray(pallas_drr.project_with_mats_pallas(vol, Rx, Rz, dx))
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 5e-3, rel  # bf16 MXU-input truncation level


@requires_tpu
def test_pallas_backproject_onchip_production_shape():
    from liftreg_tpu.ops import drr, pallas_drr

    SZ, P, RES = 160, 4, 240
    rng = np.random.default_rng(1)
    proj = jnp.asarray(rng.uniform(0, 3, (1, P, RES, RES))
                       .astype(np.float32))
    poses = drr.synthesize_poses(30.0, P, SZ)
    Bu, Bv = drr.backward_matrices(poses, (SZ, SZ, SZ), (RES, RES))
    ref = np.asarray(drr.backproject_with_mats(proj, Bu, Bv))
    got = np.asarray(pallas_drr.backproject_with_mats_pallas(proj, Bu, Bv))
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 5e-2, rel
