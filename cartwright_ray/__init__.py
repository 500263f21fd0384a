"""cartwright_ray — a Ray-Data-native spatial-join + tiling engine.

A brand-new engine (NOT a port) that subsumes the query/data-processing
capabilities of the reference column profiler ``jataware/cartwright``
(/root/reference): geospatial/temporal column inference re-expressed as
deterministic vectorized validator cascades running inside
``ray.data.Dataset.map_batches`` stages, plus the spatial-join/tiling
operators (geohash/H3/S2 cell index, web-mercator tiles, point-in-polygon,
kNN, zonal stats), dedup/text-analysis/similarity-search operators a
large-scale training-data pipeline needs.

Design rules (see SURVEY.md):
- every stage is a ``Dataset`` batch transform over zero-copy Arrow;
- stateful stages (lookup tables, spatial indexes) are actor pools;
- wide steps are explicit ``groupby``/``sort`` shuffles with documented keys;
- nothing in the library calls ``ray.init``/``ray.shutdown``.
"""

__version__ = "0.1.0"
