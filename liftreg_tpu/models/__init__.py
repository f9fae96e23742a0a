"""Model registry.

The reference wires models by dotted class path in the config
(``cur_task_setting.json:60``, resolved by ``utils/general.get_class``).
Here the registry is resolved at config-parse time — no runtime string
imports — but the reference's class-path strings are accepted as aliases so
existing ``cur_task_setting.json`` files keep working.
"""
from .blocks import ConvBlock, ConvResBlock, FullyConnectBlock, gaussian_smooth  # noqa: F401
from .subspace import LiftRegSubspace  # noqa: F401
from .subspace_backproj import LiftRegSubspaceBackproj, SubspaceEncoder  # noqa: F401
from .unet2d3d import RegNet2D3D  # noqa: F401

MODEL_REGISTRY = {
    "subspace_backproj": LiftRegSubspaceBackproj,
    "subspace": LiftRegSubspace,
    "regnet2d3d": RegNet2D3D,
    # reference class-path aliases
    "liftreg.models.LiftRegDeformSubspaceBackproj.model": LiftRegSubspaceBackproj,
    "liftreg.models.LiftRegDeformSubspace.model": LiftRegSubspace,
    "liftreg.models.previous.RegNet2D3D.model": RegNet2D3D,
}


def get_model(name):
    if name in MODEL_REGISTRY:
        return MODEL_REGISTRY[name]
    raise KeyError(f"unknown model '{name}'; known: {sorted(MODEL_REGISTRY)}")
