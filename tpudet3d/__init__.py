"""tpudet3d — a TPU-native (JAX/XLA/Pallas/pjit) two-stage 3D object detection
framework for the Objectron dataset.

Capability-parity rebuild of sovrasov/3d-object-detection.pytorch
(reference layout documented in SURVEY.md).  Unlike the reference
(`torchdet3d/__init__.py:6-11`), we do not mutate ``sys.path`` and we do not
eagerly import heavyweight subpackages: everything under ``tpudet3d`` is
import-light so that jit caches, CLI startup and tests stay fast.
"""

from .version import __version__

__all__ = ['__version__']
