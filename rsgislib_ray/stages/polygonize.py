"""Connected-component labeling (clump) and polygonize over tiled grids.

Reimplements the reference's clump/polygonize family:
- ``clump`` connected components of equal-valued pixels
  (/root/reference/python/src/segmentation.cpp:685; tiled driver
  python/rsgislib/segmentation/tiledclump.py:48-231)
- ``polygonise_raster_to_vec_lyr`` 4-/8-connectivity
  (/root/reference/python/rsgislib/vectorutils/createvectors.py:25-123,
  8CONNECTED option :231-233 of the C++ binding)

Execution mirrors the reference's tiled strategy
(tiledsegsingle.py:462-706: per-tile work, then border-region
reconciliation) but Ray-Data-first:

1. ``groupby(tile_id).map_groups``: per-tile local CC on a dense tile
   raster (vectorized min-propagation + pointer jumping — no Python
   per-pixel loop). Local label = min pixel_id of the component, so
   labels are globally unique and deterministic without coordination.
2. border strips (one-pixel frames) are tiny vs tile area; they flow to
   one union-find over the CONTRACTED label graph (edges = same-value
   adjacent border pixels of neighboring tiles). This replaces the
   reference's stage-2/3 "re-segment the borders" files-on-disk dance.
3. a broadcast relabel map_batches rewrites local -> global root labels
   (root = min pixel_id in the merged component -> deterministic under
   any partitioning).

Output: (pixel rows + ``comp_label``); ``components_summary`` gives the
per-component RAT-style rows (value, n_pixels, bbox, centroid) matching
clumps_spatial_location/extent semantics
(/root/reference/python/src/rastergis.cpp:1692,1710).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _local_cc_unionfind(
    rows, cols, values, pixel_ids, eight_conn: bool
) -> np.ndarray:
    """Exact local CC via sorted-edge union-find (numpy + path-halving
    loop over EDGES of the contracted graph only). Used as the
    authoritative implementation — min-propagation above can need many
    rounds on snake shapes."""
    r0, c0 = rows.min(), cols.min()
    h = rows.max() - r0 + 1
    w = cols.max() - c0 + 1
    idx_grid = np.full((h, w), -1, dtype=np.int64)
    rr = rows - r0
    cc = cols - c0
    idx_grid[rr, cc] = np.arange(len(rows))
    val_grid = np.full((h, w), np.nan)
    val_grid[rr, cc] = values
    present = idx_grid >= 0

    shifts = [(0, 1), (1, 0)] + ([(1, 1), (1, -1)] if eight_conn else [])
    ea, eb = [], []
    for dr, dc in shifts:
        a_r = slice(max(0, -dr), h - max(0, dr))
        a_c = slice(max(0, -dc), w - max(0, dc))
        b_r = slice(max(0, dr), h + min(0, dr))
        b_c = slice(max(0, dc), w + min(0, dc))
        same = (
            present[a_r, a_c]
            & present[b_r, b_c]
            & (val_grid[a_r, a_c] == val_grid[b_r, b_c])
        )
        ea.append(idx_grid[a_r, a_c][same])
        eb.append(idx_grid[b_r, b_c][same])
    ea = np.concatenate(ea) if ea else np.empty(0, dtype=np.int64)
    eb = np.concatenate(eb) if eb else np.empty(0, dtype=np.int64)

    parent = np.arange(len(rows), dtype=np.int64)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(ea.tolist(), eb.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    # resolve to roots, then map root position -> min pixel_id
    roots = np.array([find(i) for i in range(len(rows))], dtype=np.int64)
    order = np.argsort(roots, kind="stable")
    sr = roots[order]
    starts = np.concatenate([[0], np.flatnonzero(np.diff(sr)) + 1])
    min_pid = np.minimum.reduceat(pixel_ids[order], starts)
    root_min = dict(zip(sr[starts].tolist(), min_pid.tolist()))
    return np.array([root_min[r] for r in roots], dtype=np.int64)


def clump(
    raster: ray.data.Dataset,
    tile_size: int = 256,
    value_col: str = "value",
    eight_conn: bool = False,
    no_data=None,
) -> ray.data.Dataset:
    """Distributed connected-component labeling.

    Returns the input rows + ``comp_label`` (global min pixel_id of the
    component). Requires columns pixel_id,row,col,value.
    """

    def tag_tiles(batch: pa.Table) -> pa.Table:
        r = batch["row"].to_numpy()
        c = batch["col"].to_numpy()
        tid = (r // tile_size) * np.int64(2**20) + (c // tile_size)
        return batch.append_column("tile_id", pa.array(tid, type=pa.int64()))

    tiled = raster.map_batches(tag_tiles, batch_format="pyarrow")
    if no_data is not None:
        tiled = tiled.map_batches(
            lambda t: t.filter(
                pa.compute.not_equal(t[value_col], pa.scalar(no_data))
            ),
            batch_format="pyarrow",
        )

    def local(g: pd.DataFrame) -> pd.DataFrame:
        lab = _local_cc_unionfind(
            g["row"].to_numpy(),
            g["col"].to_numpy(),
            g[value_col].to_numpy(),
            g["pixel_id"].to_numpy(),
            eight_conn,
        )
        g = g.copy()
        g["local_label"] = lab
        # border flag: pixels on the tile frame participate in merging
        r = g["row"].to_numpy()
        c = g["col"].to_numpy()
        g["is_border"] = (
            (r % tile_size == 0)
            | (r % tile_size == tile_size - 1)
            | (c % tile_size == 0)
            | (c % tile_size == tile_size - 1)
        )
        return g

    labeled = tiled.groupby("tile_id").map_groups(local, batch_format="pandas")
    labeled = labeled.materialize()

    # ---- contracted cross-tile merge on border strips only ----------
    borders = labeled.map_batches(
        lambda t: t.filter(t["is_border"]).select(
            ["row", "col", value_col, "local_label"]
        ),
        batch_format="pyarrow",
    ).to_pandas()

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    shifts = [(0, 1), (1, 0)] + ([(1, 1), (1, -1)] if eight_conn else [])
    b = borders
    for dr, dc in shifts:
        a = b.copy()
        a["row"] = a["row"] + dr
        a["col"] = a["col"] + dc
        m = a.merge(b, on=["row", "col"], suffixes=("_a", "_b"))
        m = m[m[f"{value_col}_a"] == m[f"{value_col}_b"]]
        for la, lb in zip(m["local_label_a"], m["local_label_b"]):
            if la != lb:
                union(int(la), int(lb))

    labels = np.unique(borders["local_label"].to_numpy())
    root_map = {int(l): find(int(l)) for l in labels}
    # resolve roots to min-pixel-id transitively (roots are labels
    # themselves = pixel ids, and union keeps the minimum as root)
    keys = np.array(sorted(root_map), dtype=np.int64)
    vals = np.array([root_map[k] for k in sorted(root_map)], dtype=np.int64)
    ref = ray.put((keys, vals))

    def relabel(batch: pa.Table) -> pa.Table:
        k, v = ray.get(ref) if hasattr(ref, "hex") else ref
        lab = batch["local_label"].to_numpy()
        if len(k) == 0:
            mapped = lab
        else:
            pos = np.clip(np.searchsorted(k, lab), 0, len(k) - 1)
            mapped = np.where(k[pos] == lab, v[pos], lab)
        out = batch.append_column("comp_label", pa.array(mapped, type=pa.int64()))
        return out.drop_columns(["is_border", "local_label", "tile_id"])

    return labeled.map_batches(relabel, batch_format="pyarrow")


def components_summary(clumped: ray.data.Dataset, value_col: str = "value") -> pa.Table:
    """Per-component RAT-style summary (clump size / extent / centroid —
    rastergis clumps_spatial_location/extent analog). Partial-aggregated
    per batch before the groupby."""

    def partial(batch: pa.Table) -> pa.Table:
        lab = batch["comp_label"].to_numpy()
        r = batch["row"].to_numpy().astype(np.float64)
        c = batch["col"].to_numpy().astype(np.float64)
        v = batch[value_col].to_numpy()
        order = np.argsort(lab, kind="stable")
        sl = lab[order]
        starts = np.concatenate([[0], np.flatnonzero(np.diff(sl)) + 1])
        take = order[starts]
        return pa.table(
            {
                "comp_label": sl[starts],
                "n": np.diff(np.concatenate([starts, [len(sl)]])).astype(np.int64),
                "value": v[take],
                "sum_r": np.add.reduceat(r[order], starts),
                "sum_c": np.add.reduceat(c[order], starts),
                "min_r": np.minimum.reduceat(r[order], starts),
                "max_r": np.maximum.reduceat(r[order], starts),
                "min_c": np.minimum.reduceat(c[order], starts),
                "max_c": np.maximum.reduceat(c[order], starts),
            }
        )

    partials = clumped.map_batches(partial, batch_format="pyarrow", batch_size=65536)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        n = int(g["n"].sum())
        return pd.DataFrame(
            {
                "comp_label": [int(g["comp_label"].iloc[0])],
                "value": [g["value"].iloc[0]],
                "n_pixels": [n],
                "centroid_row": [float(g["sum_r"].sum()) / n],
                "centroid_col": [float(g["sum_c"].sum()) / n],
                "min_row": [g["min_r"].min()],
                "max_row": [g["max_r"].max()],
                "min_col": [g["min_c"].min()],
                "max_col": [g["max_c"].max()],
            }
        )

    return (
        partials.groupby("comp_label")
        .map_groups(combine, batch_format="pandas")
        .to_pandas()
        .sort_values("comp_label")
        .reset_index(drop=True)
        .pipe(pa.Table.from_pandas, preserve_index=False)
    )


def component_rings(
    clumped: ray.data.Dataset, grid_cell: float = 1.0
) -> pa.Table:
    """Trace each component's OUTER boundary ring (polygonize proper —
    /root/reference/python/rsgislib/vectorutils/createvectors.py:25-123
    produces polygon features; this produces the equivalent ring
    coordinate lists).

    Per component (``groupby(comp_label).map_groups``): collect its
    cells, extract boundary edges vectorized (edges whose neighbor cell
    is not in the component), then chain edges counter-clockwise. The
    Python loop runs over BOUNDARY EDGES only (O(perimeter), not
    O(area)). Rings are emitted as flat [x1,y1,...] lists in grid
    units; holes are ignored (outer ring only — documented v1 contract;
    the reference emits multipolygons with holes).
    """

    def trace(g: pd.DataFrame) -> pd.DataFrame:
        label = int(g["comp_label"].iloc[0])
        value = g["value"].iloc[0]
        r = g["row"].to_numpy()
        c = g["col"].to_numpy()
        cells = set(zip(r.tolist(), c.tolist()))
        # boundary edges as directed segments, CCW around the region
        # (region to the LEFT of direction of travel); grid coords:
        # x = col, y = row (row axis points up here; orientation is
        # consistent within the engine)
        edges: dict[tuple[int, int], tuple[int, int]] = {}
        for rr, cc in cells:
            if (rr - 1, cc) not in cells:  # bottom edge, left-to-right
                edges[(cc, rr)] = (cc + 1, rr)
            if (rr, cc + 1) not in cells:  # right edge, bottom-to-top
                edges[(cc + 1, rr)] = (cc + 1, rr + 1)
            if (rr + 1, cc) not in cells:  # top edge, right-to-left
                edges[(cc + 1, rr + 1)] = (cc, rr + 1)
            if (rr, cc - 1) not in cells:  # left edge, top-to-bottom
                edges[(cc, rr + 1)] = (cc, rr)
        # chain from the lexicographically smallest vertex (deterministic)
        start = min(edges)
        ring = [start]
        cur = edges.pop(start)
        while cur != start:
            ring.append(cur)
            cur = edges.pop(cur)
        xy = []
        for vx, vy in ring:
            xy.extend([vx * grid_cell, vy * grid_cell])
        return pd.DataFrame(
            {
                "comp_label": [label],
                "value": [value],
                "n_pixels": [len(g)],
                "ring_xy": [xy],
            }
        )

    out = (
        clumped.groupby("comp_label")
        .map_groups(trace, batch_format="pandas")
        .to_pandas()
        .sort_values("comp_label")
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(out, preserve_index=False)
