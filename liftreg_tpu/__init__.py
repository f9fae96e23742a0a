"""liftreg_tpu: a TPU-native (JAX/XLA/Pallas) 2D/3D deformable registration
framework with the capabilities of uncbiag/LiftReg.

Registers a 3D CT to a set of limited-angle 2D X-ray projections (DRRs) by
lifting the projections into a 3D feature volume via differentiable
backprojection and predicting the deformation inside a PCA statistical
deformation subspace (reference ``README.md:2-11``).
"""

__version__ = "0.1.0"

_LAZY = {
    "RegistrationPipeline": ("liftreg_tpu.pipeline", "RegistrationPipeline"),
    "ServingModel": ("liftreg_tpu.serving", "ServingModel"),
    "export_serving": ("liftreg_tpu.serving", "export_serving"),
    "read_artifact": ("liftreg_tpu.serving", "read_artifact"),
    "make_refiner": ("liftreg_tpu.refine", "make_refiner"),
    "make_projection_refiner": ("liftreg_tpu.refine",
                                "make_projection_refiner"),
    "RegistrationTrainer": ("liftreg_tpu.train", "RegistrationTrainer"),
}


def __getattr__(name):
    """Lazy top-level exports: ``from liftreg_tpu import ServingModel``
    without importing jax/flax at package-import time (keeps CLI startup
    and artifact inspection light)."""
    if name in _LAZY:
        import importlib
        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'liftreg_tpu' has no attribute {name!r}")
