from .pip_join import PolygonIndex, pip_join, pip_join_shuffle, brute_force_pip
from .knn_join import knn_join, brute_force_knn
from .radius_join import (radius_join, radius_join_shuffle,
                          brute_force_radius)
from .zonal import zonal_stats, brute_force_zonal, synth_tile_pixels

__all__ = [
    "PolygonIndex", "pip_join", "pip_join_shuffle", "brute_force_pip",
    "knn_join", "brute_force_knn", "radius_join", "radius_join_shuffle",
    "brute_force_radius",
    "zonal_stats", "brute_force_zonal", "synth_tile_pixels",
]
