"""Space-to-depth reformulation of the encoder's first two conv stages.

Why this exists (measured, DESIGN.md §4a): the encoder's stage-0 conv
(3³, C=5→16, stride 1, 160³) is the one non-warp line far off its
roofline — 26.2 ms for a B=4 bf16 batch vs a ~1.4 ms HBM floor — because
XLA's TPU conv lowering cannot tile a 5-channel contraction onto the
128-lane MXU. The classic TPU fix is *space-to-depth*: re-lay the volume
as 2×2×2 blocks folded into channels, which turns stages 0+1 into
2³-kernel convolutions with MXU-friendly channel counts (40→128 and
128→32) at half resolution. The transform is EXACT — the 2³ kernels are
index-gathered from the same (3,3,3,Cin,F) parameters, so the parameter
tree, checkpoints, and training dynamics are unchanged.

Derivation (per axis; zero-based kernel tap k = d+1, d ∈ {-1,0,1}):

* pack: pad the input by 1 voxel front/back (SAME padding of stage 0),
  then block pairs: ``X2[Q, (s,c)] = xpad[2Q+s, c]``, Q ∈ [0, D/2+1).
* stage 0 (stride 1): output voxel p = 2P+r needs ``xpad[2P+r+d+1]``;
  writing r+d+1 = 2t+s maps it to blocks P+t, t ∈ {0,1} — a k=2 VALID
  conv with ``W2[t,(s,c),(r,f)] = w[2t+s-r-1+1, c, f]`` (zero when
  2t+s-r-1 ∉ {-1,0,1}). Output ``y2[P,(r,f)]`` is exactly the
  space-to-depth packing of the stage-0 output.
* stage 1 (stride 2): output P needs ``y[2P+d]`` = block P-1+t, taps
  ``V2[t,(r,f),g] = v[2t+r-2+1, f, g]`` — a k=2 VALID conv over y2
  front-padded by one (zero) block. Its output is at 80³ with plain
  channels: exactly what stage 2 consumes. No unpacking needed.

FLOP cost of the redundant zero taps: (4/3)³ ≈ 2.4× the logical 17.7
GFLOP per 160³ volume — but at real MXU utilization instead of ~0.4%.

Reference context: stages per ``SubspaceEncoder``
(``liftreg_tpu/models/subspace_backproj.py:43-47``), i.e. the reference's
first two ``convBlock``s (``src/liftreg/models/
LiftRegDeformSubspaceBackproj.py:20,27-33``, ``layers/layers.py:335-372``).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .blocks import torch_bias_uniform, torch_kaiming_uniform

__all__ = ["eligible", "pack_s2d", "stage0_weights", "stage1_weights",
           "conv0_s2d", "conv1_s2d", "unpack_s2d", "conv_pair_s2d",
           "ConvParams"]


class _KernelBias(nn.Module):
    """Inner scope declaring ``kernel``/``bias`` with nn.Conv's names."""
    kshape: Sequence[int]
    fan_in: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", torch_kaiming_uniform(),
                       tuple(self.kshape))
        b = self.param("bias", torch_bias_uniform(self.fan_in),
                       (int(self.kshape[-1]),))
        return k, b


class ConvParams(nn.Module):
    """Declares a ``ConvBlock``-identical parameter subtree
    (``<name>/Conv_0/{kernel,bias}``) without running the XLA conv, so
    the s2d path below swaps in transparently: same initializers, same
    checkpoint layout, same param dtypes as ``blocks.ConvBlock``."""
    kshape: Sequence[int]  # (k, k, k, Cin, F)

    @nn.compact
    def __call__(self):
        receptive = int(np.prod(self.kshape[:-2]))
        fan_in = receptive * int(self.kshape[-2])
        return _KernelBias(self.kshape, fan_in, name="Conv_0")()


def eligible(x_shape, enc_filters) -> bool:
    """The s2d pair applies when all spatial dims are even (blocks of 2)
    and there are at least two encoder stages (stride 1 then stride 2,
    which SubspaceEncoder guarantees by construction)."""
    spatial = x_shape[1:4]
    return (len(enc_filters) >= 2
            and all(int(s) % 2 == 0 and int(s) >= 4 for s in spatial))


def pack_s2d(x):
    """(B, D, W, H, C) -> (B, D/2+1, W/2+1, H/2+1, 8C).

    Pads by one voxel on every side (stage 0's SAME padding) and folds
    2×2×2 blocks into channels, sub-position (sz, sy, sx) major over c.
    """
    B, D, W, H, C = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    dq, wq, hq = (D + 2) // 2, (W + 2) // 2, (H + 2) // 2
    xp = xp.reshape(B, dq, 2, wq, 2, hq, 2, C)
    xp = xp.transpose(0, 1, 3, 5, 2, 4, 6, 7)       # (B,dq,wq,hq,sz,sy,sx,C)
    return xp.reshape(B, dq, wq, hq, 8 * C)


def _axis_maps(d_of_tsr):
    """Per-axis kernel-tap index and validity for a (2,2,2)->(t,s,r) or
    (2,2)->(t,r) displacement table."""
    valid = (d_of_tsr >= -1) & (d_of_tsr <= 1)
    taps = np.clip(d_of_tsr + 1, 0, 2)
    return taps, valid


def stage0_weights(w):
    """(3,3,3,C,F) -> (2,2,2, 8C, 8F) s2d kernel (gather + mask; exact)."""
    C, F = int(w.shape[3]), int(w.shape[4])
    t = np.arange(2)
    # d = 2t + s - r - 1 per axis
    d = 2 * t[:, None, None] + t[None, :, None] - t[None, None, :] - 1
    taps, valid = _axis_maps(d)                      # (t, s, r) each axis

    idx = np.indices((2,) * 9)           # tz,ty,tx, sz,sy,sx, rz,ry,rx
    KZ = taps[idx[0], idx[3], idx[6]]
    KY = taps[idx[1], idx[4], idx[7]]
    KX = taps[idx[2], idx[5], idx[8]]
    MASK = (valid[idx[0], idx[3], idx[6]] & valid[idx[1], idx[4], idx[7]]
            & valid[idx[2], idx[5], idx[8]])
    # gather: (tz,ty,tx,sz,sy,sx,rz,ry,rx, C, F)
    w2 = w[KZ, KY, KX] * jnp.asarray(MASK, w.dtype)[..., None, None]
    # -> (tz,ty,tx, sz,sy,sx, C, rz,ry,rx, F) -> (2,2,2, 8C, 8F)
    w2 = w2.transpose(0, 1, 2, 3, 4, 5, 9, 6, 7, 8, 10)
    return w2.reshape(2, 2, 2, 8 * C, 8 * F)


def stage1_weights(v):
    """(3,3,3,F,G) -> (2,2,2, 8F, G) s2d kernel for the stride-2 stage."""
    F, G = int(v.shape[3]), int(v.shape[4])
    t = np.arange(2)
    d = 2 * t[:, None] + t[None, :] - 2              # (t, r) per axis
    taps, valid = _axis_maps(d)

    idx = np.indices((2,) * 6)                       # tz,ty,tx, rz,ry,rx
    KZ = taps[idx[0], idx[3]]
    KY = taps[idx[1], idx[4]]
    KX = taps[idx[2], idx[5]]
    MASK = (valid[idx[0], idx[3]] & valid[idx[1], idx[4]]
            & valid[idx[2], idx[5]])
    v2 = v[KZ, KY, KX] * jnp.asarray(MASK, v.dtype)[..., None, None]
    # (tz,ty,tx, rz,ry,rx, F, G) -> (2,2,2, 8F, G)
    return v2.reshape(2, 2, 2, 8 * F, G)


def _conv(x, w, dtype):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NDHWC", "DHWIO", "NDHWC"))
    if dtype is not None:
        x, w = x.astype(dtype), w.astype(dtype)
    elif x.dtype != w.dtype:
        # promote like flax.nn.Conv with dtype=None (e.g. bf16 input,
        # f32 params -> compute in f32)
        ct = jnp.promote_types(x.dtype, w.dtype)
        x, w = x.astype(ct), w.astype(ct)
    return jax.lax.conv_general_dilated(x, w, (1, 1, 1), "VALID",
                                        dimension_numbers=dn)


def conv0_s2d(x, w0, b0, negative_slope=0.2, dtype: Any = None):
    """Stage 0 (k3, stride 1, SAME, bias, LeakyReLU) in s2d form.

    x: (B, D, W, H, C) -> packed output (B, D/2, W/2, H/2, 8F), the
    space-to-depth layout of the ConvBlock output (sub-position major
    over the F features). Unpack with :func:`unpack_s2d` when the
    full-resolution tensor itself is needed (e.g. a U-Net skip).
    """
    x2 = pack_s2d(x)                                   # (B,dq,wq,hq,8C)
    w2 = stage0_weights(w0)
    y2 = _conv(x2, w2, dtype) + jnp.tile(b0, 8).astype(
        x2.dtype if dtype is None else dtype)
    return jax.nn.leaky_relu(y2, negative_slope)


def conv1_s2d(y2, w1, b1, negative_slope=0.2, dtype: Any = None):
    """Stage 1 (k3, stride 2, pad 1, bias, LeakyReLU) applied to the
    *packed* stage-0 output. Returns plain channels-last
    (B, D/2, W/2, H/2, G) — exactly what stage 2 consumes."""
    y2p = jnp.pad(y2, ((0, 0), (1, 0), (1, 0), (1, 0), (0, 0)))
    v2 = stage1_weights(w1)
    z = _conv(y2p, v2, dtype) + b1.astype(
        y2p.dtype if dtype is None else dtype)
    return jax.nn.leaky_relu(z, negative_slope)


def unpack_s2d(y2):
    """(B, D/2, W/2, H/2, 8F) packed -> (B, D, W, H, F) full resolution."""
    B, dq, wq, hq, c8 = y2.shape
    F = c8 // 8
    y = y2.reshape(B, dq, wq, hq, 2, 2, 2, F)
    y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return y.reshape(B, 2 * dq, 2 * wq, 2 * hq, F)


def conv_pair_s2d(x, w0, b0, w1, b1, negative_slope=0.2, dtype: Any = None):
    """Stages 0+1 of the encoder as two space-to-depth convolutions.

    x: (B, D, W, H, C) channels-last; w0: (3,3,3,C,F); w1: (3,3,3,F,G).
    Returns (B, D/2, W/2, H/2, G) — bit-equal semantics to
    ``ConvBlock(F, stride=1)`` then ``ConvBlock(G, stride=2)`` with the
    same parameters (LeakyReLU between, like the originals).
    """
    y2 = conv0_s2d(x, w0, b0, negative_slope, dtype)
    return conv1_s2d(y2, w1, b1, negative_slope, dtype)
