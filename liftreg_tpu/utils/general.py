"""General helpers (reference ``src/liftreg/utils/general.py`` and misc
conversions from ``utils/utils.py:109-142``)."""
from __future__ import annotations

import importlib
import os

import numpy as np


def make_dir(directory):
    os.makedirs(directory, exist_ok=True)


def get_class(kls):
    """Resolve a component by registry name or dotted path.

    The reference resolves config strings by dynamic import
    (``general.py:9-15``). Here the framework registries are consulted
    first (so reference class-path strings keep working without the
    reference package existing); a genuine dotted path to user code is
    importable as a fallback extension point.
    """
    from ..data.dataset import DATASET_REGISTRY
    from ..losses.registration import LOSS_REGISTRY
    from ..losses.similarity import SIMILARITY_REGISTRY
    from ..models import MODEL_REGISTRY

    for registry in (MODEL_REGISTRY, LOSS_REGISTRY, SIMILARITY_REGISTRY,
                     DATASET_REGISTRY):
        if kls in registry:
            return registry[kls]
    parts = kls.split(".")
    module = importlib.import_module(".".join(parts[:-1]))
    return getattr(module, parts[-1])


def t2np(v):
    """Device array -> numpy (``utils/utils.py:109-123``)."""
    return np.asarray(v)


def lift_to_dimension(a, dim):
    """View with leading singleton dims added up to ``dim``
    (``utils/utils.py:125-142``)."""
    a = np.asarray(a)
    if a.ndim > dim:
        raise ValueError("Can only add dimensions, but not remove them")
    if a.ndim == dim:
        return a
    return a.reshape([1] * (dim - a.ndim) + list(a.shape))


def parse_bool(raw, default=False):
    """Config-bool parser shared by the trainer and the export tool: real
    bools pass through; strings "false"/"0"/"no" (any case) mean False,
    anything else truthy-spelled means True. ``bool("false")`` is True, so
    naive casting silently inverts a user's intent."""
    if raw is None:
        return default
    if isinstance(raw, bool):
        return raw
    return str(raw).lower() not in ("false", "0", "no")
