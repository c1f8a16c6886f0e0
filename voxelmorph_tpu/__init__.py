"""voxelmorph_tpu: a TPU-native (JAX/XLA/Pallas) learning-based deformable
registration framework with the capabilities of voxelmorph/voxelmorph."""

__version__ = "0.1.0"

from . import generators, layers, losses, ops, py
