"""NN building blocks (flax.linen, channels-last internally).

Equivalents of the reference's ``src/liftreg/layers/layers.py``: conv blocks
(``convBlock:335-372``, ``convBlock2D:374-411``, ``convResBlock:289-333``),
``FullyConnectBlock:413-439`` and ``GaussianSmoothing:441-504``.

Initialization matches torch defaults (kaiming-uniform with a=sqrt(5) and
the matching fan-in bias bound) so that training dynamics are comparable.
Convolutions use explicit (1,1) padding — torch's ``padding=1`` — because
XLA's 'SAME' places the asymmetric pad differently for even sizes with
stride 2, which would shift every downsampled feature map by one voxel.
"""
from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def torch_kaiming_uniform(gain_a=math.sqrt(5.0)):
    """torch ``kaiming_uniform_(a=sqrt(5))`` on fan_in: U(-b, b) with
    b = sqrt(6 / ((1 + a^2) * fan_in)) = sqrt(1/fan_in) for a=sqrt(5)."""
    def init(key, shape, dtype=jnp.float32):
        # flax conv kernels: (*window, in_features, out_features)
        # flax dense kernels: (in_features, out_features)
        receptive = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
        fan_in = receptive * shape[-2]
        bound = math.sqrt(6.0 / ((1.0 + gain_a ** 2) * fan_in))
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def torch_bias_uniform(fan_in):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class ConvBlock(nn.Module):
    """conv (k3, explicit pad 1) + optional BN + LeakyReLU(0.2) + optional
    1x1 residual; reference ``convBlock`` (``layers/layers.py:335-372``).
    Works for 2D or 3D via ``ndim``."""
    features: int
    ndim: int = 3
    kernel_size: int = 3
    stride: int = 1
    use_bias: bool = True
    batchnorm: bool = False
    residual: bool = False
    negative_slope: float = 0.2
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_feat = x.shape[-1]
        fan_in = in_feat * self.kernel_size ** self.ndim
        pad = (self.kernel_size - 1) // 2
        y = nn.Conv(self.features, (self.kernel_size,) * self.ndim,
                    strides=(self.stride,) * self.ndim,
                    padding=[(pad, pad)] * self.ndim,
                    use_bias=self.use_bias,
                    kernel_init=torch_kaiming_uniform(),
                    bias_init=torch_bias_uniform(fan_in),
                    dtype=self.dtype)(x)
        if self.batchnorm:
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype)(y)
        y = nn.leaky_relu(y, self.negative_slope)
        if self.residual:
            res = nn.Conv(self.features, (1,) * self.ndim,
                          strides=(self.stride,) * self.ndim,
                          use_bias=self.use_bias,
                          kernel_init=torch_kaiming_uniform(),
                          bias_init=torch_bias_uniform(in_feat),
                          dtype=self.dtype)(x)
            y = y + res
        return y


class ConvResBlock(nn.Module):
    """conv-BN-act-conv(+res)-BN-act; reference ``convResBlock``
    (``layers/layers.py:289-333``)."""
    features: int
    ndim: int = 3
    kernel_size: int = 3
    stride: int = 1
    use_bias: bool = True
    batchnorm: bool = False
    residual: bool = False
    negative_slope: float = 0.2
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_feat = x.shape[-1]
        k, pad = self.kernel_size, (self.kernel_size - 1) // 2
        conv = lambda feats, stride, fan: nn.Conv(
            feats, (k,) * self.ndim, strides=(stride,) * self.ndim,
            padding=[(pad, pad)] * self.ndim, use_bias=self.use_bias,
            kernel_init=torch_kaiming_uniform(),
            bias_init=torch_bias_uniform(fan), dtype=self.dtype)
        y = conv(self.features, self.stride, in_feat * k ** self.ndim)(x)
        if self.batchnorm:
            y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        y = nn.leaky_relu(y, self.negative_slope)
        y = conv(self.features, 1, self.features * k ** self.ndim)(y)
        if self.residual:
            y = y + nn.Conv(self.features, (1,) * self.ndim,
                            strides=(self.stride,) * self.ndim,
                            use_bias=self.use_bias,
                            kernel_init=torch_kaiming_uniform(),
                            bias_init=torch_bias_uniform(in_feat),
                            dtype=self.dtype)(x)
        if self.batchnorm:
            y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        y = nn.leaky_relu(y, self.negative_slope)
        return y


class FullyConnectBlock(nn.Module):
    """Linear + optional LeakyReLU(0.2); reference ``FullyConnectBlock``
    (``layers/layers.py:413-439``)."""
    features: int
    use_bias: bool = True
    nonlinear: bool = True
    negative_slope: float = 0.2
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(self.features, use_bias=self.use_bias,
                     kernel_init=torch_kaiming_uniform(),
                     bias_init=torch_bias_uniform(x.shape[-1]),
                     dtype=self.dtype)(x)
        if self.nonlinear:
            y = nn.leaky_relu(y, self.negative_slope)
        return y


def gaussian_kernel_1d(size: int, sigma: float):
    x = np.arange(size, dtype=np.float64)
    mean = (size - 1) / 2.0
    k = np.exp(-(((x - mean) / sigma) ** 2) / 2.0) / (sigma * math.sqrt(2 * math.pi))
    return k


def gaussian_smooth(x, kernel_size, sigma, ndim=None):
    """Depthwise gaussian smoothing over the trailing spatial axes of a
    channels-FIRST array (B, C, *spatial); reference ``GaussianSmoothing``
    (``layers/layers.py:441-504``) including its ``padding=size//2``
    behavior (output grows by 1 for even kernels)."""
    spatial = x.ndim - 2 if ndim is None else ndim
    if np.isscalar(kernel_size):
        kernel_size = [int(kernel_size)] * spatial
    if np.isscalar(sigma):
        sigma = [float(sigma)] * spatial
    kernel = np.ones((1,), dtype=np.float64)
    for size, sg in zip(kernel_size, sigma):
        k1 = gaussian_kernel_1d(size, sg)
        kernel = np.multiply.outer(kernel, k1)
    kernel = kernel[0]
    kernel = kernel / kernel.sum()
    C = x.shape[1]
    kern = jnp.asarray(kernel, x.dtype)[None, None]
    pad = int(kernel_size[0] // 2)
    dn = ("NC" + "DWH"[:spatial], "OI" + "DWH"[:spatial], "NC" + "DWH"[:spatial])
    xs = x.reshape(-1, 1, *x.shape[2:])
    out = jax.lax.conv_general_dilated(
        xs, kern, window_strides=(1,) * spatial,
        padding=[(pad, pad)] * spatial, dimension_numbers=dn,
        feature_group_count=1)
    return out.reshape(x.shape[0], C, *out.shape[2:])
