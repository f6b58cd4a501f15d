"""Zonal statistics — per-polygon aggregates over value cells.

Reimplements ``calc_zonal_band_stats``
(/root/reference/python/rsgislib/zonalstats/__init__.py:166-520) and the
RAT populators (``populate_rat_with_stats``,
/root/reference/src/rastergis/RSGISPopRATWithStats.cpp:144-341;
percentiles :513-558; mode rastergis.cpp:1807) as a two-stage Ray Data
aggregation:

1. an actor-pool ``map_batches`` stage holds the broadcast zone STRtree
   and COMBINES WITHIN EACH BATCH (sort + ``np.*.reduceat``): it emits
   one partial row per (batch, zone) — count/sum/sumsq/min/max, or
   per-(zone, value) counts for the order statistics. The all-to-all
   ``groupby(fid)`` therefore shuffles partials, not matched cells;
2. ``groupby("fid").map_groups`` finalizes.

Pinned exact-match semantics (SURVEY.md §5):
- stddev is POPULATION std (ddof=0 — zonalstats/__init__.py:458), via
  ``sqrt(sumsq/n - (sum/n)^2)``; the two-pass C++ version
  (RSGISPopRATWithStats.cpp:340) is algebraically identical.
- mode ties -> SMALLEST modal value (scipy.stats.mstats.mode semantics,
  zonalstats/__init__.py:466-470).
- median = numpy median: mean of the two middle values for even counts
  (numpy.ma.median, :472-473).
- empty zone -> ``out_no_data`` in every requested field (:475-497).
- integer value columns make every distributed partial sum exact
  (associative) -> results independent of partitioning.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from rsgislib_ray.stages.spatial_join import ZoneSet, broadcast_zones

MOMENT_STATS = ("count", "sum", "min", "max", "mean", "stddev")
ORDER_STATS = ("mode", "median")


def _segment_reduce(zone_idx: np.ndarray, vals: np.ndarray):
    """Per-zone (cnt, sum, sumsq, min, max) via sort + reduceat."""
    order = np.argsort(zone_idx, kind="stable")
    z = zone_idx[order]
    v = vals[order]
    starts = np.concatenate([[0], np.flatnonzero(np.diff(z)) + 1])
    uz = z[starts]
    cnt = np.diff(np.concatenate([starts, [len(z)]]))
    s = np.add.reduceat(v, starts)
    sq = np.add.reduceat(v * v, starts)
    mn = np.minimum.reduceat(v, starts)
    mx = np.maximum.reduceat(v, starts)
    return uz, cnt.astype(np.int64), s, sq, mn, mx


class _ZonalMomentPartial:
    def __init__(self, zones_ref, value_col: str, x_col: str, y_col: str):
        self.zones: ZoneSet = (
            ray.get(zones_ref) if hasattr(zones_ref, "hex") else zones_ref
        )
        self.tree = self.zones.build_tree()
        self.value_col = value_col
        self.x_col = x_col
        self.y_col = y_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        px = batch[self.x_col].to_numpy()
        py = batch[self.y_col].to_numpy()
        pi, zi = self.zones.match_points(self.tree, px, py)
        if len(pi) == 0:
            return pa.table(
                {
                    "fid": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                    "sum_v": pa.array([], pa.int64()),
                    "sumsq_v": pa.array([], pa.int64()),
                    "min_v": pa.array([], pa.int64()),
                    "max_v": pa.array([], pa.int64()),
                }
            )
        vals = batch[self.value_col].to_numpy()[pi].astype(np.int64)
        uz, cnt, s, sq, mn, mx = _segment_reduce(zi, vals)
        return pa.table(
            {
                "fid": self.zones.fid[uz],
                "cnt": cnt,
                "sum_v": s,
                "sumsq_v": sq,
                "min_v": mn,
                "max_v": mx,
            }
        )


class _ZonalValueCountPartial:
    def __init__(self, zones_ref, value_col: str, x_col: str, y_col: str):
        self.zones: ZoneSet = (
            ray.get(zones_ref) if hasattr(zones_ref, "hex") else zones_ref
        )
        self.tree = self.zones.build_tree()
        self.value_col = value_col
        self.x_col = x_col
        self.y_col = y_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        px = batch[self.x_col].to_numpy()
        py = batch[self.y_col].to_numpy()
        pi, zi = self.zones.match_points(self.tree, px, py)
        if len(pi) == 0:
            return pa.table(
                {
                    "fid": pa.array([], pa.int64()),
                    "val": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        vals = batch[self.value_col].to_numpy()[pi].astype(np.int64)
        key = np.stack([zi, vals], axis=1)
        uniq, counts = np.unique(key, axis=0, return_counts=True)
        return pa.table(
            {
                "fid": self.zones.fid[uniq[:, 0]],
                "val": uniq[:, 1],
                "n": counts.astype(np.int64),
            }
        )


def zonal_stats(
    cells: ray.data.Dataset,
    zones_tbl: pa.Table,
    value_col: str,
    stats: tuple[str, ...] = MOMENT_STATS,
    out_no_data: float = -9999.0,
    x_col: str = "x",
    y_col: str = "y",
    value_scale: float = 1.0,
    concurrency=(1, 8),
) -> pa.Table:
    """Per-zone stats table (one row per zone fid, empty zones filled
    with ``out_no_data``). ``value_scale`` divides sums/means back to
    the natural unit when the value column is pre-scaled to integers
    (e.g. cents -> value_scale=100)."""
    want_moments = [s for s in stats if s in MOMENT_STATS]
    # order stats: mode / median / pNN percentiles (numpy-linear
    # interpolation over the exact per-zone histogram — the reference's
    # exact-histogram percentile model, RSGISPopRATWithStats.cpp:513-558)
    want_order = [
        s
        for s in stats
        if s in ORDER_STATS or (s.startswith("p") and s[1:].isdigit())
    ]
    unknown = set(stats) - set(MOMENT_STATS) - set(want_order)
    if unknown:
        raise ValueError(f"unknown stats: {unknown}")
    ref = broadcast_zones(zones_tbl)

    base = pd.DataFrame({"fid": zones_tbl["fid"].to_numpy()})

    if want_moments:
        partials = cells.map_batches(
            _ZonalMomentPartial,
            fn_constructor_kwargs={
                "zones_ref": ref,
                "value_col": value_col,
                "x_col": x_col,
                "y_col": y_col,
            },
            batch_format="pyarrow",
            batch_size=65536,
            concurrency=concurrency,
        )

        # Native partial-sum aggregate (vectorized shuffle combine) ->
        # tiny per-zone table -> closed-form stats on the driver. The
        # integer sums keep everything exact and order-independent.
        from ray.data.aggregate import Max, Min, Sum

        agg = (
            partials.groupby("fid")
            .aggregate(
                Sum("cnt", alias_name="cnt"),
                Sum("sum_v", alias_name="sum_v"),
                Sum("sumsq_v", alias_name="sumsq_v"),
                Min("min_v", alias_name="min_v"),
                Max("max_v", alias_name="max_v"),
            )
            .to_pandas()
        )
        cnt = agg["cnt"].to_numpy().astype(np.int64)
        s = agg["sum_v"].to_numpy().astype(np.int64)
        q = agg["sumsq_v"].to_numpy().astype(np.int64)
        m = cnt.astype(np.float64)
        sd = s.astype(np.float64)
        qd = q.astype(np.float64)
        mean = sd / m
        var = qd / m - (sd / m) * (sd / m)
        mom = pd.DataFrame(
            {
                "fid": agg["fid"].to_numpy().astype(np.int64),
                "count": cnt,
                "sum": sd / value_scale,
                "min": agg["min_v"].to_numpy().astype(np.float64) / value_scale,
                "max": agg["max_v"].to_numpy().astype(np.float64) / value_scale,
                "mean": mean / value_scale,
                "stddev": np.sqrt(var) / value_scale,
            }
        )
        base = base.merge(mom[["fid"] + want_moments], on="fid", how="left")

    if want_order:
        partials = cells.map_batches(
            _ZonalValueCountPartial,
            fn_constructor_kwargs={
                "zones_ref": ref,
                "value_col": value_col,
                "x_col": x_col,
                "y_col": y_col,
            },
            batch_format="pyarrow",
            batch_size=65536,
            concurrency=concurrency,
        )

        # Native (fid, val) count combine -> per-zone histograms are
        # small by construction (exact-histogram percentile model,
        # RSGISPopRATWithStats.cpp:513-558); finalize vectorized on the
        # driver with one pandas pass over the sorted histogram table.
        from ray.data.aggregate import Sum

        vc = (
            partials.groupby(["fid", "val"])
            .aggregate(Sum("n", alias_name="n"))
            .to_pandas()
            .sort_values(["fid", "val"])
            .reset_index(drop=True)
        )
        pcts = [
            (s, float(s[1:]) / 100.0)
            for s in want_order
            if s.startswith("p") and s[1:].isdigit()
        ]
        rows = []
        for fid, g in vc.groupby("fid", sort=True):
            vals = g["val"].to_numpy()
            counts = g["n"].to_numpy()
            # mode: smallest value among max-count (scipy mstats.mode)
            mode = float(vals[counts == counts.max()].min())
            # median: numpy semantics over the expanded multiset
            total = counts.sum()
            cum = np.cumsum(counts)
            k = total // 2
            if total % 2 == 1:
                median = float(vals[np.searchsorted(cum, k + 1)])
            else:
                lo = float(vals[np.searchsorted(cum, k)])
                hi = float(vals[np.searchsorted(cum, k + 1)])
                median = (lo + hi) / 2.0
            rec = [int(fid), mode / value_scale, median / value_scale]
            for _name, q in pcts:
                # numpy-linear: pos = (n-1)*q over the expanded multiset,
                # read order stats from the histogram without expanding
                pos = (total - 1) * q
                lo_i = int(np.floor(pos))
                hi_i = int(np.ceil(pos))
                lo_v = float(vals[np.searchsorted(cum, lo_i + 1)])
                hi_v = float(vals[np.searchsorted(cum, hi_i + 1)])
                frac = pos - lo_i
                rec.append((lo_v + (hi_v - lo_v) * frac) / value_scale)
            rows.append(tuple(rec))
        ords = pd.DataFrame(
            rows, columns=["fid", "mode", "median"] + [s for s, _ in pcts]
        )
        base = base.merge(ords[["fid"] + want_order], on="fid", how="left")

    for c in list(want_moments) + list(want_order):
        base[c] = base[c].fillna(out_no_data)
    if "count" in base.columns:
        base["count"] = base["count"].astype(np.int64)
    return pa.Table.from_pandas(
        base.sort_values("fid").reset_index(drop=True), preserve_index=False
    )
