"""Grid-tiling stages — tile assignment, per-tile partitioned output.

The reference materializes tiles as files and fans multiprocessing over
them (create_tiles /root/reference/python/src/imageutils.cpp:2061;
create_tiles_multi_core imageutils/__init__.py:2813-2914; grid layout
tools/geometrytools.py:478-538). Here a tile is just a key: assignment
is a stateless vectorized ``map_batches`` (no shuffle), and a tile-
partitioned sink is ``write_parquet(partition_cols=["tile_id"])`` so a
resumed run can skip finished tile directories.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from rsgislib_ray.functions.cells import cells_from_xy
from rsgislib_ray.functions.grid import TileSpec


def assign_tiles(
    ds: ray.data.Dataset,
    spec: TileSpec,
    x_col: str = "x",
    y_col: str = "y",
    out_col: str = "tile_id",
) -> ray.data.Dataset:
    """Append the reference-layout tile id (-1 outside the bbox)."""

    def tag(batch: pa.Table) -> pa.Table:
        tid = spec.assign(batch[x_col].to_numpy(), batch[y_col].to_numpy())
        return batch.append_column(out_col, pa.array(tid, type=pa.int64()))

    return ds.map_batches(tag, batch_format="pyarrow")


def assign_cells(
    ds: ray.data.Dataset,
    level: int,
    x_col: str = "x",
    y_col: str = "y",
    out_col: str = "cell_id",
) -> ray.data.Dataset:
    """Append the quadkey cell id at ``level`` (-1 outside the frame)."""

    def tag(batch: pa.Table) -> pa.Table:
        cid = cells_from_xy(batch[x_col].to_numpy(), batch[y_col].to_numpy(), level)
        return batch.append_column(out_col, pa.array(cid, type=pa.int64()))

    return ds.map_batches(tag, batch_format="pyarrow")


def tile_counts(
    ds: ray.data.Dataset,
    spec: TileSpec,
    x_col: str = "x",
    y_col: str = "y",
) -> ray.data.Dataset:
    """Rows-per-tile histogram, pre-aggregated per batch before the
    (tiny) groupby — the skew probe used to pick adaptive cell splits
    (SURVEY.md §4 skew row)."""

    def partial(batch: pa.Table) -> pa.Table:
        tid = spec.assign(batch[x_col].to_numpy(), batch[y_col].to_numpy())
        u, c = np.unique(tid, return_counts=True)
        return pa.table({"tile_id": u, "partial": c.astype(np.int64)})

    from ray.data.aggregate import Sum

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    return partials.groupby("tile_id").aggregate(Sum("partial", alias_name="n_rows"))


def write_tiled(
    ds: ray.data.Dataset,
    out_dir: str,
    spec: TileSpec,
    x_col: str = "x",
    y_col: str = "y",
) -> None:
    """Tile-partitioned parquet sink (one directory per tile)."""
    tagged = assign_tiles(ds, spec, x_col, y_col)
    tagged.write_parquet(out_dir, partition_cols=["tile_id"])


def split_hot_cells(
    ds: ray.data.Dataset,
    level: int,
    threshold: int,
    x_col: str = "x",
    y_col: str = "y",
    out_col: str = "part_cell",
    max_level: int = 16,
) -> ray.data.Dataset:
    """Adaptive skew splitting: cells whose population exceeds
    ``threshold`` are recursively re-keyed to finer levels until every
    partition key is under threshold (or ``max_level``). The count
    pre-passes are cheap per-batch partial-count groupbys; the final
    tagging broadcasts the per-level hot-cell sets. (The reference has
    no skew handling — uniform tiles; valid-data tiling is manual,
    imageutils/tilingutils.py:87.)
    """
    from ray.data.aggregate import Sum

    hot_per_level: dict[int, np.ndarray] = {}
    lvl = level
    while lvl < max_level:
        # count rows per cell AT THE ROW'S EFFECTIVE LEVEL (rows inside
        # a previously-hot cell are counted at lvl, others are settled)
        hp = {k: v for k, v in hot_per_level.items()}

        def partial(batch: pa.Table, _lvl=lvl, _hp=hp) -> pa.Table:
            x = batch[x_col].to_numpy()
            y = batch[y_col].to_numpy()
            active = np.ones(len(x), dtype=bool)
            for plvl, phot in _hp.items():
                pc_ = cells_from_xy(x, y, plvl)
                active &= np.isin(pc_, phot)
            cid = cells_from_xy(x[active], y[active], _lvl)
            u, c = np.unique(cid, return_counts=True)
            return pa.table({"cell_id": u, "partial": c.astype(np.int64)})

        counts = (
            ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
            .groupby("cell_id")
            .aggregate(Sum("partial", alias_name="n"))
            .to_pandas()
        )
        hot = counts[counts["n"] > threshold]["cell_id"].to_numpy()
        if len(hot) == 0:
            break
        hot_per_level[lvl] = np.sort(hot.astype(np.int64))
        lvl += 1

    levels_sorted = sorted(hot_per_level)

    def tag(batch: pa.Table) -> pa.Table:
        x = batch[x_col].to_numpy()
        y = batch[y_col].to_numpy()
        out = cells_from_xy(x, y, level)
        # descend: rows inside every hot ancestor keep getting finer keys
        still = np.ones(len(x), dtype=bool)
        for plvl in levels_sorted:
            cid = cells_from_xy(x, y, plvl)
            still = still & np.isin(cid, hot_per_level[plvl])
            out = np.where(still, cells_from_xy(x, y, plvl + 1), out)
        return batch.append_column(out_col, pa.array(out, type=pa.int64()))

    return ds.map_batches(tag, batch_format="pyarrow")
