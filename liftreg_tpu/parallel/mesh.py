"""Device mesh and sharding helpers (data-parallel scale-out).

The reference is single-GPU (``main.py:108-110``; no distributed backend
exists anywhere — SURVEY.md section 2). The TPU-native equivalent of its
"distributed backend" is batch sharding over the ICI-connected chips of a
slice: one ``jax.sharding.Mesh`` with a ``data`` axis, batches sharded on
axis 0, parameters replicated, gradients all-reduced by XLA over ICI.
The mesh abstraction generalizes to multi-slice (DCN) meshes for free.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data"):
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise RuntimeError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} device(s) are visible on platform "
                f"{devices[0].platform!r} — refusing to silently build a "
                f"smaller mesh")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data"):
    """Shard axis 0 (batch); later axes replicated."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis_name: str = "data"):
    """Device-put a host batch dict with the batch axis sharded. Arrays whose
    leading dim isn't divisible by the mesh (e.g. per-case poses shared
    across the batch) are replicated."""
    n = mesh.devices.size
    out = {}
    for k, v in batch.items():
        if hasattr(v, "shape") and v.ndim > 0 and v.shape[0] % n == 0:
            out[k] = jax.device_put(v, batch_sharding(mesh, axis_name))
        else:
            out[k] = jax.device_put(v, replicated(mesh))
    return out
