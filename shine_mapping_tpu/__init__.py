"""TPU-native implicit-SDF LiDAR mapping framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
PRBonn/SHINE_mapping: sparse hierarchical feature grids stored as
device-resident spatial hash tables, a shallow MLP SDF decoder, BCE-on-sdf
training from LiDAR ray samples, batch + incremental mapping drivers,
marching-cubes meshing and offline mesh evaluation.
"""

from .config import SHINEConfig

__version__ = "0.1.0"
__all__ = ["SHINEConfig", "__version__"]
