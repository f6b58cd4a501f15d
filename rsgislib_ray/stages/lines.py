"""Polyline (linear-referencing) operators.

Reimplements the vectorgeoms line family:

- ``split_lines_to_reg_pts`` (/root/reference/python/rsgislib/
  vectorgeoms/__init__.py:431-530): points at regular ``pt_step``
  intervals along each line, attributed with line id, point index,
  x/y and distance from the line start. ``get_pt_on_line`` (:141) is
  the same interpolation for a single fraction.
- ``convert_polygon_to_polyline`` (:25) is the trivial vertex
  re-emission (the fixture side below).

Physical plan: one range sort on (line_id, seq) — the same
sorted-run shape as ``stages/events`` — then every line fully inside
a block is processed VECTORIZED across lines (no per-line Python);
only the <=2 lines touching a block edge fall back to a tiny grouped
pass.

Exactness contract (mirrors the repo's micro-nat pattern): segment
lengths are integerized as ``floor(sqrt(d2_scaled) * micro)`` micro-
units (d2_scaled is the exact integer squared length on the
``int_scale`` lattice; sqrt of an integer-valued double is IEEE-exact
and engine-independent). Cumulative lengths are then int64 sums —
order-independent, and safe against DuckDB's pairwise window
aggregation. The interpolated coordinate uses ONE float division
``(d - cum0) / seg_len`` plus one multiply-add per axis, the same
expression the SQL oracle evaluates. Points are emitted for
``k * pt_step < total_length`` (k >= 0): a degenerate (zero-length
or single-vertex) line emits nothing.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from rsgislib_ray.stages.events import sorted_user_apply

MICRO = 1_000_000  # micro-units per coordinate unit


def _points_core(
    line: np.ndarray,
    x: np.ndarray,
    y: np.ndarray,
    step_micro: int,
    int_scale: int,
    emit_dir: bool = False,
) -> dict:
    """Vectorized points-at-intervals over (line, seq)-sorted vertex
    arrays containing any number of complete lines. With ``emit_dir``
    also emits the containing segment's direction (dx_u, dy_u in
    coordinate units) and float length len_u — the inputs of the
    orthogonal-line construction."""
    m = len(line)
    empty = {
        "line_id": np.empty(0, np.int64),
        "pt_id": np.empty(0, np.int64),
        "x": np.empty(0, np.float64),
        "y": np.empty(0, np.float64),
        "dist_micro": np.empty(0, np.int64),
    }
    if emit_dir:
        empty.update(
            {
                "dx_u": np.empty(0, np.float64),
                "dy_u": np.empty(0, np.float64),
                "len_u": np.empty(0, np.float64),
            }
        )
    if m < 2:
        return empty
    seg = line[1:] == line[:-1]
    if not seg.any():
        return empty
    i0 = np.flatnonzero(seg)  # vertex index of each segment start
    ix = np.rint(x * int_scale).astype(np.int64)
    iy = np.rint(y * int_scale).astype(np.int64)
    dxs = ix[i0 + 1] - ix[i0]
    dys = iy[i0 + 1] - iy[i0]
    d2 = dxs * dxs + dys * dys
    ilen = np.floor(
        np.sqrt(d2.astype(np.float64)) * (MICRO / int_scale)
    ).astype(np.int64)
    seg_line = line[i0]
    # global (non-resetting) cumulative axis over the sorted segments
    cs = np.concatenate([[0], np.cumsum(ilen)])
    starts = np.flatnonzero(
        np.concatenate([[True], seg_line[1:] != seg_line[:-1]])
    )
    ends = np.concatenate([starts[1:], [len(seg_line)]])
    totals = cs[ends] - cs[starts]
    npts = np.where(
        totals > 0, (totals + step_micro - 1) // step_micro, 0
    ).astype(np.int64)
    if npts.sum() == 0:
        return empty
    pt_line_idx = np.repeat(np.arange(len(starts)), npts)
    k = np.arange(int(npts.sum())) - np.repeat(
        np.cumsum(npts) - npts, npts
    )
    d = k * step_micro
    g = d + cs[starts][pt_line_idx]  # global distance of each point
    si = np.searchsorted(cs[1:], g, side="right")
    frac = (g - cs[si]).astype(np.float64) / ilen[si].astype(np.float64)
    px = x[i0[si]] + frac * (x[i0[si] + 1] - x[i0[si]])
    py = y[i0[si]] + frac * (y[i0[si] + 1] - y[i0[si]])
    out = {
        "line_id": seg_line[starts][pt_line_idx],
        "pt_id": k.astype(np.int64),
        "x": px,
        "y": py,
        "dist_micro": d.astype(np.int64),
    }
    if emit_dir:
        out["dx_u"] = dxs[si].astype(np.float64) / int_scale
        out["dy_u"] = dys[si].astype(np.float64) / int_scale
        out["len_u"] = np.sqrt(d2[si].astype(np.float64)) / int_scale
    return out


def points_along_lines(
    vertices: ray.data.Dataset,
    pt_step: float,
    line_col: str = "line_id",
    seq_col: str = "seq",
    x_col: str = "x",
    y_col: str = "y",
    int_scale: int = 200,
) -> ray.data.Dataset:
    """split_lines_to_reg_pts over a (line_id, seq, x, y) vertex
    table: returns (line_id, pt_id, x, y, dist_micro) point features
    every ``pt_step`` units along each polyline."""
    step_micro = int(round(pt_step * MICRO))

    def block_fn(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                _points_core(
                    np.empty(0, np.int64),
                    np.empty(0, np.float64),
                    np.empty(0, np.float64),
                    step_micro,
                    int_scale,
                )
            )
        return pa.table(
            _points_core(
                batch[line_col].to_numpy().astype(np.int64),
                batch[x_col].to_numpy().astype(np.float64),
                batch[y_col].to_numpy().astype(np.float64),
                step_micro,
                int_scale,
            )
        )

    def group_fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(seq_col)
        return pd.DataFrame(
            _points_core(
                g[line_col].to_numpy().astype(np.int64),
                g[x_col].to_numpy().astype(np.float64),
                g[y_col].to_numpy().astype(np.float64),
                step_micro,
                int_scale,
            )
        )

    return sorted_user_apply(
        vertices, block_fn, group_fn, user_col=line_col,
        sort_cols=(seq_col,),
    )


def closest_line_intersections(
    base: ray.data.Dataset,
    targets_tbl: pa.Table,
    uid_col: str = "uid",
    base_cols: tuple = ("sx", "sy", "ex", "ey"),
    target_cols: tuple = ("ax", "ay", "bx", "by"),
    tid_col: str = "tid",
    int_scale: int = 200,
) -> ray.data.Dataset:
    """closest_line_intersection + line_intersection_range
    (/root/reference/python/rsgislib/vectorgeoms/__init__.py:587,699):
    for each base segment (start s -> end e), find its PROPER crossings
    (strict interior on both segments, collinear overlaps excluded)
    with the broadcast target-segment layer and keep the one closest to
    the start, plus the parametric range. Output per base segment with
    >=1 crossing: ``uid, n_isect, t`` (closest crossing's parameter
    along s->e), the crossing point ``x, y``, and ``t_max``.

    Candidates come from an STRtree over target-segment bboxes (built
    once per worker process from the broadcast table). Intersection
    tests and parameters are exact integer cross products on the
    ``int_scale`` lattice; selection orders by (float64 t, tid) — the
    identical expression the SQL oracle sorts by. The crossing point is
    one float division (t = t_num/den) and a multiply-add per axis."""
    import ray as _ray

    from rsgislib_ray.state.strtree import STRtree

    tax = np.rint(targets_tbl[target_cols[0]].to_numpy() * int_scale)
    tay = np.rint(targets_tbl[target_cols[1]].to_numpy() * int_scale)
    tbx = np.rint(targets_tbl[target_cols[2]].to_numpy() * int_scale)
    tby = np.rint(targets_tbl[target_cols[3]].to_numpy() * int_scale)
    state = {
        "tid": targets_tbl[tid_col].to_numpy().astype(np.int64),
        "ax": tax.astype(np.int64),
        "ay": tay.astype(np.int64),
        "bx": tbx.astype(np.int64),
        "by": tby.astype(np.int64),
        "bounds": np.stack(
            [
                np.minimum(tax, tbx) / int_scale,
                np.maximum(tax, tbx) / int_scale,
                np.minimum(tay, tby) / int_scale,
                np.maximum(tay, tby) / int_scale,
            ],
            axis=1,
        ),
    }
    ref = _ray.put(state)
    _trees: dict = {}

    def isect_batch(batch: pa.Table) -> pa.Table:
        from rsgislib_ray.state.broadcast import cached

        st = cached(ref)
        if id(st) not in _trees:
            _trees[id(st)] = STRtree(st["bounds"])
        tree = _trees[id(st)]

        sx = batch[base_cols[0]].to_numpy().astype(np.float64)
        sy = batch[base_cols[1]].to_numpy().astype(np.float64)
        ex = batch[base_cols[2]].to_numpy().astype(np.float64)
        ey = batch[base_cols[3]].to_numpy().astype(np.float64)
        uid = batch[uid_col].to_numpy().astype(np.int64)
        isx = np.rint(sx * int_scale).astype(np.int64)
        isy = np.rint(sy * int_scale).astype(np.int64)
        iex = np.rint(ex * int_scale).astype(np.int64)
        iey = np.rint(ey * int_scale).astype(np.int64)

        qb = np.stack(
            [
                np.minimum(isx, iex) / int_scale,
                np.maximum(isx, iex) / int_scale,
                np.minimum(isy, iey) / int_scale,
                np.maximum(isy, iey) / int_scale,
            ],
            axis=1,
        )
        qi, ti = tree.query_bboxes(qb)
        empty = pa.table(
            {
                "uid": np.empty(0, np.int64),
                "n_isect": np.empty(0, np.int64),
                "t": np.empty(0, np.float64),
                "x": np.empty(0, np.float64),
                "y": np.empty(0, np.float64),
                "t_max": np.empty(0, np.float64),
            }
        )
        if len(qi) == 0:
            return empty
        rx = iex[qi] - isx[qi]
        ry = iey[qi] - isy[qi]
        swx = st["bx"][ti] - st["ax"][ti]
        swy = st["by"][ti] - st["ay"][ti]
        den = rx * swy - ry * swx
        qpx = st["ax"][ti] - isx[qi]
        qpy = st["ay"][ti] - isy[qi]
        t_num = qpx * swy - qpy * swx
        u_num = qpx * ry - qpy * rx
        pos = den > 0
        ok = (den != 0) & np.where(
            pos,
            (t_num > 0) & (t_num < den) & (u_num > 0) & (u_num < den),
            (t_num < 0) & (t_num > den) & (u_num < 0) & (u_num > den),
        )
        if not ok.any():
            return empty
        qi, ti = qi[ok], ti[ok]
        t = t_num[ok].astype(np.float64) / den[ok].astype(np.float64)
        tid = st["tid"][ti]
        order = np.lexsort((tid, t, qi))
        qs, ts_, tds = qi[order], t[order], tid[order]
        firsts = np.concatenate([[True], qs[1:] != qs[:-1]])
        fi = np.flatnonzero(firsts)
        counts = np.diff(np.concatenate([fi, [len(qs)]]))
        sel = order[fi]
        t_max = np.maximum.reduceat(ts_, fi)
        return pa.table(
            {
                "uid": uid[qi[sel]],
                "n_isect": counts.astype(np.int64),
                "t": t[sel],
                "x": sx[qi[sel]] + t[sel] * (ex[qi[sel]] - sx[qi[sel]]),
                "y": sy[qi[sel]] + t[sel] * (ey[qi[sel]] - sy[qi[sel]]),
                "t_max": t_max,
            }
        )

    return base.map_batches(
        isect_batch, batch_format="pyarrow", batch_size=16384
    )


def second_line_intersections(
    base: ray.data.Dataset,
    targets_tbl: pa.Table,
    uid_col: str = "uid",
    base_cols: tuple = ("sx", "sy", "ex", "ey"),
    target_cols: tuple = ("ax", "ay", "bx", "by"),
    tid_col: str = "tid",
    int_scale: int = 200,
) -> ray.data.Dataset:
    """scnd_line_intersection_range (vectorgeoms/__init__.py:988):
    cut each base segment at its SECOND point of intersection with the
    broadcast boundary-segment layer (first crossing = entering a
    polygon, second = leaving). Per base segment with >= 1 crossing:
    ``uid, n_isect, start_x, start_y, end_x, end_y, len``. The
    reference quirk is pinned: a segment with exactly ONE crossing
    keeps the initialised (0, 0) second point, so end = (0, 0) and
    len = the start-to-origin distance. Ordering is by (t, tid) —
    distance from the start is t*|d|, monotone in t, so this equals
    the reference's distance ordering; exact-corner touches are
    excluded by the strict-interior integer crossing test (OGR would
    include them — documented deviation, measure-zero on the
    half-integer fixture lattice)."""
    import ray as _ray

    from rsgislib_ray.state.strtree import STRtree

    tax = np.rint(targets_tbl[target_cols[0]].to_numpy() * int_scale)
    tay = np.rint(targets_tbl[target_cols[1]].to_numpy() * int_scale)
    tbx = np.rint(targets_tbl[target_cols[2]].to_numpy() * int_scale)
    tby = np.rint(targets_tbl[target_cols[3]].to_numpy() * int_scale)
    state = {
        "tid": targets_tbl[tid_col].to_numpy().astype(np.int64),
        "ax": tax.astype(np.int64),
        "ay": tay.astype(np.int64),
        "bx": tbx.astype(np.int64),
        "by": tby.astype(np.int64),
        "bounds": np.stack(
            [
                np.minimum(tax, tbx) / int_scale,
                np.maximum(tax, tbx) / int_scale,
                np.minimum(tay, tby) / int_scale,
                np.maximum(tay, tby) / int_scale,
            ],
            axis=1,
        ),
    }
    ref = _ray.put(state)
    _trees: dict = {}

    def isect_batch(batch: pa.Table) -> pa.Table:
        from rsgislib_ray.state.broadcast import cached

        st = cached(ref)
        if id(st) not in _trees:
            _trees[id(st)] = STRtree(st["bounds"])
        tree = _trees[id(st)]

        sx = batch[base_cols[0]].to_numpy().astype(np.float64)
        sy = batch[base_cols[1]].to_numpy().astype(np.float64)
        ex = batch[base_cols[2]].to_numpy().astype(np.float64)
        ey = batch[base_cols[3]].to_numpy().astype(np.float64)
        uid = batch[uid_col].to_numpy().astype(np.int64)
        isx = np.rint(sx * int_scale).astype(np.int64)
        isy = np.rint(sy * int_scale).astype(np.int64)
        iex = np.rint(ex * int_scale).astype(np.int64)
        iey = np.rint(ey * int_scale).astype(np.int64)

        qb = np.stack(
            [
                np.minimum(isx, iex) / int_scale,
                np.maximum(isx, iex) / int_scale,
                np.minimum(isy, iey) / int_scale,
                np.maximum(isy, iey) / int_scale,
            ],
            axis=1,
        )
        qi, ti = tree.query_bboxes(qb)
        empty = pa.table(
            {
                "uid": np.empty(0, np.int64),
                "n_isect": np.empty(0, np.int64),
                "start_x": np.empty(0, np.float64),
                "start_y": np.empty(0, np.float64),
                "end_x": np.empty(0, np.float64),
                "end_y": np.empty(0, np.float64),
                "len": np.empty(0, np.float64),
            }
        )
        if len(qi) == 0:
            return empty
        rx = iex[qi] - isx[qi]
        ry = iey[qi] - isy[qi]
        swx = st["bx"][ti] - st["ax"][ti]
        swy = st["by"][ti] - st["ay"][ti]
        den = rx * swy - ry * swx
        qpx = st["ax"][ti] - isx[qi]
        qpy = st["ay"][ti] - isy[qi]
        t_num = qpx * swy - qpy * swx
        u_num = qpx * ry - qpy * rx
        pos = den > 0
        ok = (den != 0) & np.where(
            pos,
            (t_num > 0) & (t_num < den) & (u_num > 0) & (u_num < den),
            (t_num < 0) & (t_num > den) & (u_num < 0) & (u_num > den),
        )
        if not ok.any():
            return empty
        qi, ti = qi[ok], ti[ok]
        t = t_num[ok].astype(np.float64) / den[ok].astype(np.float64)
        tid = st["tid"][ti]
        order = np.lexsort((tid, t, qi))
        qs = qi[order]
        firsts = np.concatenate([[True], qs[1:] != qs[:-1]])
        fi = np.flatnonzero(firsts)
        counts = np.diff(np.concatenate([fi, [len(qs)]]))
        has2 = counts >= 2
        sel2 = order[np.minimum(fi + 1, len(order) - 1)]
        li = qi[order[fi]]
        t2 = t[sel2]
        end_x = np.where(
            has2, sx[li] + t2 * (ex[li] - sx[li]), 0.0
        )
        end_y = np.where(
            has2, sy[li] + t2 * (ey[li] - sy[li]), 0.0
        )
        dx = end_x - sx[li]
        dy = end_y - sy[li]
        return pa.table(
            {
                "uid": uid[li],
                "n_isect": counts.astype(np.int64),
                "start_x": sx[li],
                "start_y": sy[li],
                "end_x": end_x,
                "end_y": end_y,
                "len": np.sqrt(dx * dx + dy * dy),
            }
        )

    return base.map_batches(
        isect_batch, batch_format="pyarrow", batch_size=16384
    )


def orthogonal_lines(
    vertices: ray.data.Dataset,
    pt_step: float,
    line_len: float,
    left_hand: bool = False,
    line_col: str = "line_id",
    seq_col: str = "seq",
    x_col: str = "x",
    y_col: str = "y",
    int_scale: int = 200,
) -> ray.data.Dataset:
    """create_orthg_lines / find_pt_to_side (vectorgeoms/__init__.py:
    205-430): at every ``pt_step`` interval point P on each polyline,
    emit the orthogonal line P -> P + line_len * n, where n is the unit
    normal of the containing segment (right-hand side of travel by
    default; the reference's atan/cos trig is algebraically this
    normal-vector construction). Output: line_id, pt_id, x, y (= P),
    ox, oy (the orthogonal end point)."""
    step_micro = int(round(pt_step * MICRO))
    sign = -1.0 if left_hand else 1.0

    def finish(d: dict) -> pa.Table:
        nx = sign * d["dy_u"] / d["len_u"]
        ny = -sign * d["dx_u"] / d["len_u"]
        return pa.table(
            {
                "line_id": d["line_id"],
                "pt_id": d["pt_id"],
                "x": d["x"],
                "y": d["y"],
                "ox": d["x"] + line_len * nx,
                "oy": d["y"] + line_len * ny,
            }
        )

    def block_fn(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return finish(
                _points_core(
                    np.empty(0, np.int64), np.empty(0, np.float64),
                    np.empty(0, np.float64), step_micro, int_scale,
                    emit_dir=True,
                )
            )
        return finish(
            _points_core(
                batch[line_col].to_numpy().astype(np.int64),
                batch[x_col].to_numpy().astype(np.float64),
                batch[y_col].to_numpy().astype(np.float64),
                step_micro, int_scale, emit_dir=True,
            )
        )

    def group_fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(seq_col)
        return finish(
            _points_core(
                g[line_col].to_numpy().astype(np.int64),
                g[x_col].to_numpy().astype(np.float64),
                g[y_col].to_numpy().astype(np.float64),
                step_micro, int_scale, emit_dir=True,
            )
        ).to_pandas()

    return sorted_user_apply(
        vertices, block_fn, group_fn, user_col=line_col,
        sort_cols=(seq_col,),
    )
