"""rsgislib_ray — a Ray-Data-native spatial-join + tiling engine.

A from-scratch reimplementation of the core geoprocessing capabilities
of RSGISLib (reference at /root/reference, dotysan/rsgislib) expressed
Ray-Data-first: every operator is a transform over
``ray.data.Dataset`` — ``map_batches`` over zero-copy Arrow batches for
per-record work, actor pools for stateful stages (STRtree PIP, kNN
indexes), ``groupby``-based shuffles only where semantics require an
all-to-all exchange (zonal aggregation, cell-partitioned joins,
cross-tile connected components).

Layout:
    functions/  pure numpy/Arrow kernels (cells, grid, geometry, text, hashing)
    state/      broadcastable index structures (STRtree) + aggregation specs
    sources/    deterministic synthesis + Lance-style table adapter + testdata derivations
    stages/     Dataset -> Dataset operators (join, knn, zonal, raster, tiling, dedup, text, ann, polygonize)
    pipelines/  composed headline pipelines + the driver-facing queries
    runtime/    checkpoint/resume manifests, metrics, lineage
"""

import logging as _logging

# Parquet blocks written by pandas carry b'pandas' schema metadata whose
# decoded form is a dict — pa.Schema with such metadata is unhashable and
# Ray Data's schema-unify dedup logs a benign warning PER BLOCK. Silence
# it here (this module is imported by every worker that runs our fns).
_logging.getLogger(
    "ray.data._internal.arrow_ops.transform_pyarrow"
).setLevel(_logging.ERROR)

from rsgislib_ray.functions.cells import CellFrame, DEFAULT_FRAME, cells_from_xy
from rsgislib_ray.functions.grid import TileSpec, bbox_grid

__all__ = [
    "CellFrame",
    "DEFAULT_FRAME",
    "cells_from_xy",
    "TileSpec",
    "bbox_grid",
]

__version__ = "0.1.0"
