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

from rsgislib_ray.functions.arrowize import arrowize
from rsgislib_ray.stages.components import (
    edge_components_minlabel as _edge_components_minlabel,
)


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

    # vectorized min-hooking union-find over the local edge list (node
    # INDICES play the label role); isolated nodes stay self-rooted
    keys, roots = _edge_components_minlabel(ea, eb)
    roots_all = np.arange(len(rows), dtype=np.int64)
    roots_all[keys] = roots
    # map each component (identified by min index) -> min pixel_id
    order = np.argsort(roots_all, kind="stable")
    sr = roots_all[order]
    starts = np.concatenate([[0], np.flatnonzero(np.diff(sr)) + 1])
    min_pid = np.minimum.reduceat(pixel_ids[order], starts)
    comp_of = np.searchsorted(sr[starts], roots_all)
    return min_pid[comp_of]


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

    labeled = tiled.groupby("tile_id").map_groups(arrowize(local), batch_format="pandas")
    labeled = labeled.materialize()

    # ---- contracted cross-tile merge: DISTRIBUTED edge extraction ---
    # Each border pixel emits an anchor row at its own position plus one
    # probe row per forward shift; after a sort on the position key,
    # matching (anchor, probe) rows of equal value in one run are a
    # label-graph edge. Only label EDGES (pre-deduped per block) reach
    # the driver — border pixel rows never do. Runs straddling a block
    # boundary are forwarded raw (O(#blocks) rows) and matched on the
    # driver.
    shifts = [(0, 1), (1, 0)] + ([(1, 1), (1, -1)] if eight_conn else [])
    POS = np.int64(1) << 32

    def emit_probe_rows(t: pa.Table) -> pa.Table:
        t = t.filter(t["is_border"])
        r = t["row"].to_numpy().astype(np.int64)
        c = t["col"].to_numpy().astype(np.int64)
        v = t[value_col].to_numpy().astype(np.int64)
        lab = t["local_label"].to_numpy().astype(np.int64)
        pos = [r * POS + c]
        anchor = [np.ones(len(r), dtype=np.int8)]
        vals = [v]
        labs = [lab]
        for dr, dc in shifts:
            pos.append((r + dr) * POS + (c + dc))
            anchor.append(np.zeros(len(r), dtype=np.int8))
            vals.append(v)
            labs.append(lab)
        return pa.table(
            {
                "pos": np.concatenate(pos),
                "anchor": np.concatenate(anchor),
                "val": np.concatenate(vals),
                "lab": np.concatenate(labs),
            }
        )

    probe_rows = labeled.map_batches(
        emit_probe_rows, batch_format="pyarrow"
    ).sort("pos")

    def emit_edges(t: pa.Table) -> pa.Table:
        p = t["pos"].to_numpy()
        an = t["anchor"].to_numpy()
        v = t["val"].to_numpy()
        lab = t["lab"].to_numpy()
        order = np.argsort(p, kind="stable")
        p, an, v, lab = p[order], an[order], v[order], lab[order]
        new = np.concatenate([[True], p[1:] != p[:-1]])
        starts = np.flatnonzero(new)
        ends = np.concatenate([starts[1:], [len(p)]])
        ea, eb = [], []
        fwd = []  # boundary-run row indices forwarded raw
        for ri in range(len(starts)):
            st, en = starts[ri], ends[ri]
            if st == 0 or en == len(p):
                fwd.append(np.arange(st, en))
                continue
            if en - st < 2:
                continue
            a_idx = np.flatnonzero(an[st:en] == 1)
            if len(a_idx) == 0:
                continue
            ai = st + a_idx[0]
            pr = np.arange(st, en)[an[st:en] == 0]
            ok = (v[pr] == v[ai]) & (lab[pr] != lab[ai])
            ea.append(np.minimum(lab[pr[ok]], lab[ai]))
            eb.append(np.maximum(lab[pr[ok]], lab[ai]))
        ea = np.concatenate(ea) if ea else np.empty(0, dtype=np.int64)
        eb = np.concatenate(eb) if eb else np.empty(0, dtype=np.int64)
        if len(ea):  # contract: dedupe edges within the block
            uniq = np.unique(np.stack([ea, eb], axis=1), axis=0)
            ea, eb = uniq[:, 0], uniq[:, 1]
        fi = np.concatenate(fwd) if fwd else np.empty(0, dtype=np.int64)
        return pa.table(
            {
                "ea": np.concatenate([ea, p[fi]]),
                "eb": np.concatenate([eb, lab[fi]]),
                "val": np.concatenate(
                    [np.zeros(len(ea), dtype=np.int64), v[fi]]
                ),
                "kind": np.concatenate(
                    [
                        np.zeros(len(ea), dtype=np.int8),
                        np.where(an[fi] == 1, np.int8(1), np.int8(2)),
                    ]
                ),
            }
        )

    edge_rows = probe_rows.map_batches(
        emit_edges, batch_format="pyarrow"
    ).to_pandas()
    edges = edge_rows[edge_rows["kind"] == 0]
    ea = edges["ea"].to_numpy().astype(np.int64)
    eb = edges["eb"].to_numpy().astype(np.int64)
    bnd = edge_rows[edge_rows["kind"] != 0]
    if len(bnd):  # match forwarded boundary runs (anchor kind=1 vs probe 2)
        anch = bnd[bnd["kind"] == 1]
        prob = bnd[bnd["kind"] == 2]
        m = anch.merge(
            prob, left_on=["ea", "val"], right_on=["ea", "val"],
            suffixes=("_a", "_p"),
        )
        m = m[m["eb_a"] != m["eb_p"]]
        if len(m):
            ea = np.concatenate([ea, m[["eb_a", "eb_p"]].min(axis=1).to_numpy()])
            eb = np.concatenate([eb, m[["eb_a", "eb_p"]].max(axis=1).to_numpy()])

    keys, vals = _edge_components_minlabel(ea, eb)
    ref = ray.put((keys, vals))

    def relabel(batch: pa.Table) -> pa.Table:
        from rsgislib_ray.state.broadcast import cached

        k, v = cached(ref)
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

    # NATIVE distributed combine (one Sum/Min/Max aggregate — no
    # per-component Python; components can number in the millions) then
    # a vectorized finalize on the per-component rows.
    from ray.data.aggregate import Max, Min, Sum

    agg = (
        partials.groupby("comp_label")
        .aggregate(
            Sum("n"), Min("value"), Sum("sum_r"), Sum("sum_c"),
            Min("min_r"), Max("max_r"), Min("min_c"), Max("max_c"),
        )
        .to_pandas()
        .sort_values("comp_label")
        .reset_index(drop=True)
    )
    n = agg["sum(n)"].to_numpy().astype(np.int64)
    out = pd.DataFrame(
        {
            "comp_label": agg["comp_label"].astype(np.int64),
            "value": agg["min(value)"],
            "n_pixels": n,
            "centroid_row": agg["sum(sum_r)"].to_numpy() / n,
            "centroid_col": agg["sum(sum_c)"].to_numpy() / n,
            "min_row": agg["min(min_r)"],
            "max_row": agg["max(max_r)"],
            "min_col": agg["min(min_c)"],
            "max_col": agg["max(max_c)"],
        }
    )
    return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)


# left-turn preference at pinch vertices: for incoming direction d the
# continuation priority is [left, straight, right] (region stays on the
# left, so the sharpest left turn keeps the same boundary cycle)
_TURN_PRIORITY = {
    (1, 0): [(0, 1), (1, 0), (0, -1)],
    (0, 1): [(-1, 0), (0, 1), (1, 0)],
    (-1, 0): [(0, -1), (-1, 0), (0, 1)],
    (0, -1): [(1, 0), (0, -1), (-1, 0)],
}


def _trace_all_cycles(cells: set) -> list[list[tuple[int, int]]]:
    """Chain ALL boundary cycles of a cell set (region-on-left directed
    edges): the first/largest CCW cycles are outer rings, CW cycles are
    holes. Pinch vertices (two outgoing edges, possible under 8-conn or
    hole-touching corners) are resolved by the sharpest-left-turn rule,
    which yields valid, non-crossing rings."""
    edges: dict[tuple[int, int], list[tuple[int, int]]] = {}
    for rr, cc in cells:
        segs = []
        if (rr - 1, cc) not in cells:  # bottom edge, left-to-right
            segs.append(((cc, rr), (cc + 1, rr)))
        if (rr, cc + 1) not in cells:  # right edge, bottom-to-top
            segs.append(((cc + 1, rr), (cc + 1, rr + 1)))
        if (rr + 1, cc) not in cells:  # top edge, right-to-left
            segs.append(((cc + 1, rr + 1), (cc, rr + 1)))
        if (rr, cc - 1) not in cells:  # left edge, top-to-bottom
            segs.append(((cc, rr + 1), (cc, rr)))
        for a, b in segs:
            edges.setdefault(a, []).append(b)
    cycles = []
    while edges:
        start = min(edges)  # deterministic: smallest remaining vertex
        outs = edges[start]
        cur_to = min(outs)  # deterministic first step
        outs.remove(cur_to)
        if not outs:
            del edges[start]
        ring = [start]
        prev = start
        while cur_to != start:
            ring.append(cur_to)
            outs = edges[cur_to]
            if len(outs) == 1:
                nxt = outs[0]
            else:
                d_in = (cur_to[0] - prev[0], cur_to[1] - prev[1])
                nxt = None
                for d_out in _TURN_PRIORITY[d_in]:
                    cand = (cur_to[0] + d_out[0], cur_to[1] + d_out[1])
                    if cand in outs:
                        nxt = cand
                        break
                if nxt is None:
                    nxt = outs[0]
            outs.remove(nxt)
            if not outs:
                del edges[cur_to]
            prev = cur_to
            cur_to = nxt
        cycles.append(ring)
    return cycles


def component_rings(
    clumped: ray.data.Dataset, grid_cell: float = 1.0
) -> pa.Table:
    """Polygonize proper: trace every component's boundary RINGS —
    outer ring(s) CCW and interior rings (HOLES) CW — matching the
    reference's polygon output including interior rings
    (/root/reference/python/rsgislib/vectorutils/createvectors.py:25-123
    emits polygons with holes; the 8CONNECTED option maps to the clump
    stage's ``eight_conn``).

    Per component (``groupby(comp_label).map_groups``): collect cells,
    extract boundary edges (O(perimeter)), chain all cycles with a
    deterministic left-turn rule at pinch vertices. Output: one row per
    RING — (comp_label, value, n_pixels, ring_id, is_hole, area,
    ring_xy) — ring_id 0 is the largest outer ring; signed areas over a
    component's rings sum to n_pixels (holes are negative).
    """

    def trace_one(g: pd.DataFrame) -> pd.DataFrame:
        from rsgislib_ray.functions.geom import ring_area

        label = int(g["comp_label"].iloc[0])
        value = g["value"].iloc[0]
        r = g["row"].to_numpy()
        c = g["col"].to_numpy()
        cells = set(zip(r.tolist(), c.tolist()))
        cycles = _trace_all_cycles(cells)
        rows = []
        for ring in cycles:
            # collapse collinear runs (unit-edge chains) to corner
            # vertices only — minimal rings, matching polygonize output
            keep = []
            m = len(ring)
            for i in range(m):
                p0, p1, p2 = ring[i - 1], ring[i], ring[(i + 1) % m]
                if (p1[0] - p0[0]) * (p2[1] - p1[1]) != (p1[1] - p0[1]) * (
                    p2[0] - p1[0]
                ):
                    keep.append(p1)
            ring = keep if keep else ring
            xy = []
            for vx, vy in ring:
                xy.extend([vx * grid_cell, vy * grid_cell])
            area = float(ring_area(np.asarray(xy, dtype=np.float64)))
            rows.append((area, xy))
        # ring_id 0 = largest-area outer ring, then descending signed area
        rows.sort(key=lambda t: (-t[0], t[1]))
        return pd.DataFrame(
            {
                "comp_label": np.full(len(rows), label, dtype=np.int64),
                "value": [value] * len(rows),
                "n_pixels": np.full(len(rows), len(g), dtype=np.int64),
                "ring_id": np.arange(len(rows), dtype=np.int64),
                "is_hole": np.array([a < 0 for a, _ in rows], dtype=bool),
                "area": np.array([a for a, _ in rows], dtype=np.float64),
                "ring_xy": [xy for _, xy in rows],
            }
        )

    # bucket components so the grouped pass runs over a BOUNDED number
    # of Ray groups (millions of small components would otherwise pay
    # per-component scheduling + pandas conversion); components of one
    # bucket trace sequentially inside the worker.
    n_buckets = 64

    def bucket(batch: pa.Table) -> pa.Table:
        lab = batch["comp_label"].to_numpy()
        return batch.append_column(
            "_rb", pa.array((lab % n_buckets).astype(np.int64))
        )

    def trace_bucket(g: pd.DataFrame) -> pd.DataFrame:
        outs = [
            trace_one(sub) for _lab, sub in g.groupby("comp_label", sort=True)
        ]
        return pd.concat(outs, ignore_index=True)

    out = (
        clumped.map_batches(bucket, batch_format="pyarrow")
        .groupby("_rb")
        .map_groups(arrowize(trace_bucket), batch_format="pandas")
        .to_pandas()
        .sort_values(["comp_label", "ring_id"])
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)
