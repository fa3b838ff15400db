"""TPU-native implicit-SDF LiDAR mapping framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
PRBonn/SHINE_mapping: sparse hierarchical feature grids stored as
device-resident spatial hash tables, a shallow MLP SDF decoder, BCE-on-sdf
training from LiDAR ray samples, batch + incremental mapping drivers,
marching meshing and offline mesh evaluation.

Quick start (library):

    from shine_mapping_tpu import SHINEConfig
    from shine_mapping_tpu.cli.shine_batch import run_shine_mapping_batch
    cfg = SHINEConfig().load("config/maicity/maicity_batch.yaml")
    run_path, grid, params = run_shine_mapping_batch(cfg=cfg)

or from the command line:

    python -m shine_mapping_tpu.cli.shine_batch config/maicity/maicity_batch.yaml
"""

from .config import SHINEConfig

__version__ = "0.1.0"
__all__ = [
    "SHINEConfig",
    "Mesher",
    "HashGridHost",
    "LiDARDataset",
    "MapVisualizer",
    "__version__",
]


def __getattr__(name):  # lazy heavy imports
    if name == "Mesher":
        from .mesher import Mesher

        return Mesher
    if name == "HashGridHost":
        from .ops.hashgrid import HashGridHost

        return HashGridHost
    if name == "LiDARDataset":
        from .data.dataset import LiDARDataset

        return LiDARDataset
    if name == "MapVisualizer":
        from .visualizer import MapVisualizer

        return MapVisualizer
    raise AttributeError(name)
