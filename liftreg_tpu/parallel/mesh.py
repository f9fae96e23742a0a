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


# Keys that are identical across the batch (the dataset shares one
# poses.npy / one spacing per split). Replicating them matters: the models
# build their backprojection grids from ``poses[0:1]`` (the reference's
# cached-first-batch quirk), and if poses are sharded that slice lives on
# device 0 only — XLA then broadcasts the derived volume-shaped grids over
# ICI every step (~100 MB/step at 160^3 on an 8-mesh, observed as
# (1,D,W,H,3) all-reduces in the compiled HLO; tests/test_scaling_model.py).
# Replicated poses make the grid math device-local and free.
_REPLICATED_KEYS = ("target_poses", "source_poses", "spacing")


def shard_batch(batch: dict, mesh: Mesh, axis_name: str = "data"):
    """Device-put a host batch dict with the batch axis sharded. Arrays whose
    leading dim isn't divisible by the mesh (e.g. per-case poses shared
    across the batch) and batch-constant keys (poses/spacing) are
    replicated."""
    n = mesh.devices.size
    out = {}
    for k, v in batch.items():
        if (hasattr(v, "shape") and v.ndim > 0 and v.shape[0] % n == 0
                and k not in _REPLICATED_KEYS):
            out[k] = jax.device_put(v, batch_sharding(mesh, axis_name))
        else:
            out[k] = jax.device_put(v, replicated(mesh))
    return out


def pad_batch(batch: dict, target_b: int):
    """Pad every array's batch axis (axis 0) up to ``target_b`` by repeating
    the final sample, so (a) the batch divides the mesh instead of being
    silently replicated and (b) the shape is identical for every batch —
    no shape-change retrace of the jitted step on partial final batches.

    Returns ``(padded_batch, n_valid)``; callers must ignore rows
    ``[n_valid:]`` in any per-sample output. All batch-dict entries are
    per-sample stacks (data/dataset.py ``_stack_batch``), so every array
    shares the same leading dim.
    """
    b = next(v.shape[0] for v in batch.values()
             if hasattr(v, "ndim") and v.ndim > 0)
    if target_b < b:
        raise ValueError(f"pad target {target_b} < batch size {b}")
    if target_b == b:
        return batch, b
    out = {}
    for k, v in batch.items():
        if hasattr(v, "ndim") and v.ndim > 0:
            pad = np.repeat(np.asarray(v)[-1:], target_b - b, axis=0)
            out[k] = np.concatenate([np.asarray(v), pad], axis=0)
        else:
            out[k] = v
    return out, b
