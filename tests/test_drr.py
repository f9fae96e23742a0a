"""Golden tests for the DRR projector/backprojector.

Oracle: an independent torch ``grid_sample`` evaluation of the same cone-beam
geometry spec (ray/plane intersections, per-ray path length, the reference's
normalization conventions from ``sdct_projection_utils.py``), plus analytic
phantoms. Our implementation uses separable interpolation matmuls instead of
gathers; results must agree to float tolerance.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from liftreg_tpu.ops import drr


def torch_project(vol, poses, resolution, spacing):
    """Torch oracle for the forward projection (spec-equivalent gather path)."""
    D, W, H = vol.shape
    res_d, res_h = resolution
    out = np.zeros((poses.shape[0], res_d, res_h), dtype=np.float64)
    lin_x = np.linspace(-res_d / 2, res_d / 2 - 1, res_d)
    lin_y = np.linspace(-res_h / 2, res_h / 2 - 1, res_h)
    vol_t = torch.from_numpy(vol.astype(np.float64))[None, None]
    for p, (ex, ey, ez) in enumerate(poses):
        # per-ray path length per plane step
        rx = (lin_x - ex) / (-ey)
        rz = (lin_y - ez) / (-ey)
        dx = np.sqrt((rx[:, None] * spacing[0]) ** 2 + spacing[1] ** 2
                     + (rz[None, :] * spacing[2]) ** 2)
        total = np.zeros((res_d, res_h))
        for k in range(W):
            s = (k - ey) / (-ey)
            px = ex + s * (lin_x - ex)
            pz = ez + s * (lin_y - ez)
            # reference normalization: /N*2 on axes 0/2, exact on axis 1
            xn = px / D * 2.0
            zn = pz / H * 2.0
            yn = k / (W - 1.0) * 2.0 - 1.0
            grid = np.zeros((res_d, res_h, 3))
            grid[..., 0] = zn[None, :]   # torch order: x indexes H (last)
            grid[..., 1] = yn            # y indexes W
            grid[..., 2] = xn[:, None]   # z indexes D
            g = torch.from_numpy(grid)[None, None]  # (1,1,res_d,res_h,3)
            samp = F.grid_sample(vol_t, g, align_corners=True,
                                 padding_mode="zeros").numpy()[0, 0, 0]
            total += samp
        out[p] = total * dx * 0.1
    return out.astype(np.float32)


def torch_backproject(proj, poses, vol_shape):
    """Torch oracle for the backprojection lift (spec of
    ``backproj_grids_with_poses`` + ``grid_sample``)."""
    D, W, H = vol_shape
    P, proj_w, proj_h = proj.shape
    gx = np.linspace(-D / 2, D / 2 - 1, D)
    yw = np.linspace(W - 1, 0, W)
    gz = np.linspace(-H / 2, H / 2 - 1, H)
    out = np.zeros((P, D, W, H), dtype=np.float32)
    for p, (ex, ey, ez) in enumerate(poses):
        scale = ey / (ey - yw)  # (W,)
        u3 = (gx[:, None] - ex) * scale[None, :] + ex      # (D, W)
        v3 = (gz[:, None] - ez) * scale[None, :] + ez      # (H, W)
        un = u3 / proj_w * 2.0
        vn = v3 / proj_h * 2.0
        grid = np.zeros((D, W, H, 2))
        grid[..., 0] = vn.T[None, :, :].transpose(0, 1, 2)  # x -> proj_h axis
        grid = np.zeros((D, W, H, 2))
        grid[..., 0] = np.broadcast_to(vn.T[None, :, :], (D, W, H))
        grid[..., 1] = np.broadcast_to(un[:, :, None], (D, W, H))
        img = torch.from_numpy(proj[p].astype(np.float64))[None, None]
        g = torch.from_numpy(grid.reshape(1, D * W, H, 2))
        samp = F.grid_sample(img, g, align_corners=True,
                             padding_mode="zeros").numpy()
        out[p] = samp.reshape(D, W, H).astype(np.float32)
    return out


def test_project_matches_torch_oracle():
    rng = np.random.default_rng(0)
    D = W = H = 20
    vol = rng.uniform(0, 0.4, size=(D, W, H)).astype(np.float32)
    poses = drr.synthesize_poses(30.0, 4, W)
    resolution = (30, 30)
    want = torch_project(vol, poses, resolution, (2.2, 2.2, 2.2))
    got = np.asarray(drr.project(jnp.asarray(vol), poses, resolution,
                                 (2.2, 2.2, 2.2), plane_chunk=7))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_backproject_matches_torch_oracle():
    rng = np.random.default_rng(1)
    D = W = H = 16
    proj_w = proj_h = 24
    proj = rng.uniform(-1, 1, size=(4, proj_w, proj_h)).astype(np.float32)
    poses = drr.synthesize_poses(30.0, 4, W)
    want = torch_backproject(proj, poses, (D, W, H))
    got = np.asarray(drr.backproject(jnp.asarray(proj), poses, (D, W, H),
                                     plane_chunk=5))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_project_uniform_box_center_ray():
    """Central ray of the central pose through a W-filling uniform volume:
    integral = mu * sum_k dx = mu * path length (analytic)."""
    D = W = H = 32
    mu = 0.2
    vol = np.full((D, W, H), mu, dtype=np.float32)
    poses = drr.synthesize_poses(30.0, 3, W)  # middle pose has x=0
    res = (D, H)
    spacing = (1.0, 1.0, 1.0)
    got = np.asarray(drr.project(jnp.asarray(vol), poses[1:2], res, spacing))
    # Detector pixel whose ray passes nearest the volume center:
    # lin_x value closest to emitter x-line through center.
    # For the central pose (ex=0, ez=0): ray through detector (u0,0,v0) with
    # lin_x[u0]=0 -> u0 = D/2. Path samples all W planes; each contributes
    # mu*dx with dx = sqrt((rx)^2 + 1 + (rz)^2), rx=rz=0 -> dx=1.
    u0, v0 = D // 2, H // 2
    expect = mu * W * 1.0 * 0.1
    # Rays at lin_x=0 pass through the volume center plane-by-plane; the
    # x-pixel (0/D+0.5)*(D-1) is mid-volume, interior, no padding loss.
    assert got[0, u0, v0] == pytest.approx(expect, rel=1e-3)


def test_atten_coef():
    img = jnp.asarray([-2000.0, -1000.0, 0.0, 1000.0])
    out = np.asarray(drr.calc_relative_atten_coef(img))
    np.testing.assert_allclose(out, [0.0, 0.0, 0.2, 0.4], atol=1e-6)


def test_poses_synthesis_values():
    poses = drr.synthesize_poses(30.0, 4, 160)
    assert poses.shape == (4, 3)
    np.testing.assert_allclose(poses[:, 1], 3.5 * 160)
    np.testing.assert_allclose(poses[0, 0], np.tan(-15 / 180 * np.pi) * 3 * 160,
                               rtol=1e-5)
    np.testing.assert_allclose(poses[:, 2], np.linspace(-0.2, 0.2, 4) * 160,
                               rtol=1e-5)
