"""Pure-NumPy geospatial kernels (SURVEY.md §2.8 engine-only scalar kernels).

All functions are vectorized over numpy arrays so they can run inside
``map_batches`` on Arrow columns with zero Python-per-row overhead. No
external geo libraries exist in this environment (no shapely/h3/s2/pyproj);
everything here is implemented from the published specs:

- ``geohash``: standard Gustavo-Niemeyer base-32 geohash (bit-interleave).
- ``mercator``: web-mercator (EPSG:3857 / slippy-map) z/x/y tiles.
- ``s2``: S2 cell ids (face + quadratic ST projection + Hilbert curve),
  following the published S2 geometry spec.
- ``hexgrid``: hierarchical aperture-7 hexagonal cell index ("H3-style");
  see module docstring for the fidelity statement.
- ``haversine``: great-circle distance.
- ``pip``: vectorized ray-casting point-in-polygon.
"""

from .geohash import geohash_encode
from .mercator import lonlat_to_tile, tile_quadkey
from .haversine import haversine_km
from .s2 import s2_cell_id, s2_token
from .hexgrid import hex_cell, hex_parent
from .pip import points_in_polygon

__all__ = [
    "geohash_encode", "lonlat_to_tile", "tile_quadkey", "haversine_km",
    "s2_cell_id", "s2_token", "hex_cell", "hex_parent", "points_in_polygon",
]
