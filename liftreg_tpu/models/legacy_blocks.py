"""Legacy building blocks.

Equivalents of the reference's older block zoo
(``src/liftreg/layers/layers.py:8-157``: ``Conv2d_block/Conv3d_block``,
``Deconv2d_block/Deconv3d_block``, ``resize_conv3D``, ``res_block``,
``trans_layer``) and the module-form DRR projector (``proj_layer:159-236``).
These are unused by the shipped models but kept for inventory parity and as
extension points; all operate channels-last like the rest of the framework.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops import drr, resample
from .blocks import torch_bias_uniform, torch_kaiming_uniform


class ConvNdBlock(nn.Module):
    """conv + optional BN + ReLU (``Conv2d_block:8-27``, ``Conv3d_block:50-70``)."""
    features: int
    ndim: int = 3
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    has_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        fan_in = x.shape[-1] * self.kernel_size ** self.ndim
        y = nn.Conv(self.features, (self.kernel_size,) * self.ndim,
                    strides=(self.stride,) * self.ndim,
                    padding=[(self.padding, self.padding)] * self.ndim,
                    kernel_init=torch_kaiming_uniform(),
                    bias_init=torch_bias_uniform(fan_in))(x)
        if self.has_bn:
            y = nn.BatchNorm(use_running_average=not train)(y)
        return nn.relu(y)


class DeconvNdBlock(nn.Module):
    """transposed conv + optional BN + ReLU (``Deconv2d_block:29-48``,
    ``Deconv3d_block:72-92``)."""
    features: int
    ndim: int = 3
    kernel_size: int = 1
    stride: int = 1
    padding: int = 1
    has_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        fan_in = x.shape[-1] * self.kernel_size ** self.ndim
        y = nn.ConvTranspose(self.features, (self.kernel_size,) * self.ndim,
                             strides=(self.stride,) * self.ndim,
                             padding=[(self.padding, self.padding)] * self.ndim,
                             kernel_init=torch_kaiming_uniform(),
                             bias_init=torch_bias_uniform(fan_in))(x)
        if self.has_bn:
            y = nn.BatchNorm(use_running_average=not train)(y)
        return nn.relu(y)


class ResizeConv3D(nn.Module):
    """align_corners trilinear upsample to ``out_dim`` + conv + ReLU
    (``resize_conv3D:94-116``)."""
    out_dim: Sequence[int]
    features: int
    kernel_size: int = 3
    has_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        xc = jnp.moveaxis(x, -1, 1)
        xc = resample.resize_trilinear(xc, tuple(self.out_dim))
        x = jnp.moveaxis(xc, 1, -1)
        return ConvNdBlock(self.features, ndim=3,
                           kernel_size=self.kernel_size,
                           has_bn=self.has_bn)(x, train)


class ResBlock2D(nn.Module):
    """stride-2 conv + conv with residual ReLU (``res_block:119-133``)."""
    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = ConvNdBlock(self.features, ndim=2, kernel_size=4, stride=2,
                         padding=1, has_bn=True)(x, train)
        c2 = ConvNdBlock(self.features, ndim=2, kernel_size=3, stride=1,
                         padding=1, has_bn=True)(c1, train)
        return nn.relu(c1 + c2)


class TransLayer(nn.Module):
    """2D->3D feature transfer: 1x1 conv, reshape to 4^3 volume, 1x1x1
    transposed conv (``trans_layer:136-157``)."""
    in_features_3d: int

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, C) channels-last
        y = nn.Conv(x.shape[-1], (1, 1))(x)
        y = nn.relu(y)
        y = y.reshape(-1, 4, 4, 4, self.in_features_3d)
        y = nn.ConvTranspose(self.in_features_3d, (1, 1, 1))(y)
        return nn.relu(y)


class ProjLayer(nn.Module):
    """Module-form DRR projector (``proj_layer:159-236``): fixed geometry
    captured at construction, forward projects an attenuation volume.

    Static geometry (poses/matrices) is computed once per instance; the
    projection itself is the MXU path of :mod:`liftreg_tpu.ops.drr`.
    """
    volume_spacing: Sequence[float]
    scan_range: float
    proj_num: int
    in_shape: Sequence[int]          # (D, W, H)
    resolution_scale: float = 1.5

    def setup(self):
        shape = tuple(int(s) for s in self.in_shape)
        self.poses = drr.synthesize_poses(self.scan_range, self.proj_num,
                                          shape[1])
        self.resolution = (int(shape[0] * self.resolution_scale),
                           int(shape[2] * self.resolution_scale))

    def __call__(self, vol):
        """vol: (B, D, W, H) attenuation -> (B, P, res_d, res_h)."""
        return drr.project(vol, self.poses, self.resolution,
                           tuple(self.volume_spacing))
