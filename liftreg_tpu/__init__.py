"""liftreg_tpu: a TPU-native (JAX/XLA/Pallas) 2D/3D deformable registration
framework with the capabilities of uncbiag/LiftReg.

Registers a 3D CT to a set of limited-angle 2D X-ray projections (DRRs) by
lifting the projections into a 3D feature volume via differentiable
backprojection and predicting the deformation inside a PCA statistical
deformation subspace (reference ``README.md:2-11``).
"""

__version__ = "0.1.0"
