"""Golden tests: gaussian smoothing and gradient loss vs torch."""
import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from liftreg_tpu.losses import gradient_loss, ncc_loss
from liftreg_tpu.models.blocks import gaussian_smooth


def torch_gaussian_smooth(x, kernel_size, sigma, dim):
    # spec of layers/layers.py:441-504
    ks = [kernel_size] * dim
    sg = [sigma] * dim
    kernel = 1
    meshgrids = torch.meshgrid(*[torch.arange(s, dtype=torch.float32)
                                 for s in ks], indexing="ij")
    for size, std, mgrid in zip(ks, sg, meshgrids):
        mean = (size - 1) / 2
        kernel = kernel * (1 / (std * math.sqrt(2 * math.pi))
                           * torch.exp(-((mgrid - mean) / std) ** 2 / 2))
    kernel = kernel / kernel.sum()
    C = x.shape[1]
    kernel = kernel.view(1, 1, *kernel.size())
    kernel = kernel.repeat(C, *[1] * (kernel.dim() - 1))
    conv = {1: F.conv1d, 2: F.conv2d, 3: F.conv3d}[dim]
    return conv(torch.from_numpy(x), weight=kernel, groups=C,
                padding=int(kernel.shape[2] / 2)).numpy()


@pytest.mark.parametrize("dim,shape,ks", [(2, (2, 4, 12, 13), 8),
                                          (3, (1, 2, 8, 9, 10), 3)])
def test_gaussian_smooth_matches_torch(dim, shape, ks):
    rng = np.random.default_rng(0)
    x = rng.normal(size=shape).astype(np.float32)
    want = torch_gaussian_smooth(x, ks, 2.0, dim)
    got = np.asarray(gaussian_smooth(jnp.asarray(x), ks, 2.0, ndim=dim))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def torch_gradient_loss(x, y):
    # spec of layers/layers.py:258-287
    fil = torch.tensor([[1., 2, 1], [2, 4, 2], [1, 2, 1]])
    filters = []
    for axis in range(3):
        f = torch.zeros((1, 1, 3, 3, 3))
        if axis == 0:
            f[0, 0, 0], f[0, 0, 2] = fil, -fil
        elif axis == 1:
            f[0, 0, :, 0], f[0, 0, :, 2] = fil, -fil
        else:
            f[0, 0, :, :, 0], f[0, 0, :, :, 2] = fil, -fil
        filters.append(f)
    x_t, y_t = torch.from_numpy(x), torch.from_numpy(y)
    total = 0.0
    for f in filters:
        total = total + F.mse_loss(F.conv3d(x_t, f, padding=1),
                                   F.conv3d(y_t, f, padding=1))
    return float(total)


def test_gradient_loss_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 1, 7, 8, 9)).astype(np.float32)
    y = rng.normal(size=(2, 1, 7, 8, 9)).astype(np.float32)
    want = torch_gradient_loss(x, y)
    got = float(gradient_loss(jnp.asarray(x), jnp.asarray(y)))
    assert got == pytest.approx(want, rel=1e-4)


def test_score_quirk():
    """score = 1 - ncc_loss/B — replicating the reference's per-batch
    normalization quirk (RegistrationNet.py:208-210)."""
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.normal(size=(4, 1, 6, 6, 6)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(4, 1, 6, 6, 6)).astype(np.float32))
    score = 1.0 - float(ncc_loss(w, t)) / 4
    assert 0.7 < score < 1.01
