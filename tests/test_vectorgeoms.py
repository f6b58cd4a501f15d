"""Tests for stages/vectorgeoms.py — polygon-hole ops and layer
predicates (reference vectorgeoms/__init__.py:2041,2165,1221,3416,
3157,2670-3014)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data


def _rings_tbl():
    # two polygons: fid 1 outer [0,10]x[0,10] with holes 1x1 and 2x0.5;
    # fid 2 outer [20,24]x[20,28], no holes
    return pa.table(
        {
            "fid": pa.array([1, 1, 1, 2], pa.int64()),
            "ring_id": pa.array([0, 1, 2, 0], pa.int64()),
            "x0": [0.0, 1.0, 4.0, 20.0],
            "y0": [0.0, 1.0, 1.0, 20.0],
            "x1": [10.0, 2.0, 6.0, 24.0],
            "y1": [10.0, 2.0, 1.5, 28.0],
        }
    )


def test_ring_areas_match_scalar_shoelace():
    from rsgislib_ray.functions.geom import ring_area
    from rsgislib_ray.stages.vectorgeoms import (
        _ring_areas_batch,
        rect_ring_xy,
    )

    t = _rings_tbl()
    got = _ring_areas_batch(t)
    for i in range(t.num_rows):
        want = abs(ring_area(rect_ring_xy(
            t["x0"][i].as_py(), t["y0"][i].as_py(),
            t["x1"][i].as_py(), t["y1"][i].as_py())))
        assert got[i] == want


def test_delete_holes_none_and_threshold(ray_session):
    from rsgislib_ray.stages.vectorgeoms import delete_polygon_holes

    ds = ray.data.from_arrow(_rings_tbl())
    all_removed = delete_polygon_holes(ds, None).to_pandas()
    assert all_removed["ring_id"].eq(0).all() and len(all_removed) == 2
    # thres 0.9: hole areas are 1.0 and 1.0 (2x0.5) -> strictly > 0.9 both kept
    kept = delete_polygon_holes(ds, 0.9).to_pandas()
    assert len(kept) == 4
    # thres 1.0: strict > drops both
    kept2 = delete_polygon_holes(ds, 1.0).to_pandas()
    assert kept2["ring_id"].eq(0).all()


def test_centroid_and_area_with_holes(ray_session):
    from rsgislib_ray.stages.vectorgeoms import (
        poly_centroids,
        polys_with_area,
    )

    ds = ray.data.from_arrow(_rings_tbl())
    area = polys_with_area(ds).to_pandas().set_index("fid")["area"]
    assert area[1] == 100.0 - 1.0 - 1.0 and area[2] == 32.0
    c = poly_centroids(ds).to_pandas().set_index("fid")
    # fid 1: (100*5 - 1*1.5 - 1*5)/98, (100*5 - 1*1.5 - 1*1.25)/98
    assert c.loc[1, "cx"] == (500.0 - 1.5 - 5.0) / 98.0
    assert c.loc[1, "cy"] == (500.0 - 1.5 - 1.25) / 98.0
    assert c.loc[2, "cx"] == 22.0 and c.loc[2, "cy"] == 24.0


def test_rect_predicates_match_bruteforce(ray_session):
    from rsgislib_ray.stages.vectorgeoms import rect_layer_predicates

    rng = np.random.default_rng(3)
    nb, nc = 80, 60
    bx0 = rng.integers(0, 40, nb).astype(float)
    by0 = rng.integers(0, 40, nb).astype(float)
    bx1 = bx0 + rng.integers(1, 8, nb)
    by1 = by0 + rng.integers(1, 8, nb)
    cx0 = rng.integers(0, 40, nc).astype(float)
    cy0 = rng.integers(0, 40, nc).astype(float)
    cx1 = cx0 + rng.integers(1, 8, nc)
    cy1 = cy0 + rng.integers(1, 8, nc)

    def brute():
        n = dict.fromkeys(
            ["n_intersects", "n_touches", "n_overlaps", "n_within",
             "n_contains"], 0)
        for i in range(nb):
            for j in range(nc):
                inter = (bx0[i] <= cx1[j] and cx0[j] <= bx1[i]
                         and by0[i] <= cy1[j] and cy0[j] <= by1[i])
                if not inter:
                    continue
                n["n_intersects"] += 1
                interiors = (bx0[i] < cx1[j] and cx0[j] < bx1[i]
                             and by0[i] < cy1[j] and cy0[j] < by1[i])
                within = (bx0[i] >= cx0[j] and bx1[i] <= cx1[j]
                          and by0[i] >= cy0[j] and by1[i] <= cy1[j])
                contains = (cx0[j] >= bx0[i] and cx1[j] <= bx1[i]
                            and cy0[j] >= by0[i] and cy1[j] <= by1[i])
                if not interiors:
                    n["n_touches"] += 1
                if interiors and not within and not contains:
                    n["n_overlaps"] += 1
                if within:
                    n["n_within"] += 1
                if contains:
                    n["n_contains"] += 1
        return n

    want = brute()
    base = pa.table({"x0": bx0, "y0": by0, "x1": bx1, "y1": by1})
    comp = np.column_stack([cx0, cx1, cy0, cy1])
    for parts in (1, 5):
        ds = ray.data.from_arrow(base).repartition(parts)
        got = rect_layer_predicates(ds, comp).to_pandas().iloc[0]
        for k, v in want.items():
            assert got[k] == v, k


def test_line_crosses_matches_sampling(ray_session):
    from rsgislib_ray.stages.vectorgeoms import line_rect_crosses

    lines = pa.table(
        {
            "px": [11.0, 5.0, 10.0, 19.0],
            "py": [11.0, 5.0, 12.0, 19.0],
            "qx": [13.0, 25.0, 14.0, 21.0],
            "qy": [12.0, 15.0, 15.0, 21.0],
        }
    )
    # rect [10,20]x[10,20].
    # seg1 fully inside (no escape) -> not crosses.
    # seg2 passes through -> crosses.
    # seg3 starts ON the boundary, ends inside: entirely within the
    #   closed rect (t0=0, t1=1) -> NOT crosses (A ∩ B == A).
    # seg4 starts inside and exits through the corner (20,20):
    #   interior met and escapes -> crosses.
    rects = np.array([[10.0, 20.0, 10.0, 20.0]])
    out = line_rect_crosses(
        ray.data.from_arrow(lines).repartition(2), rects
    ).to_pandas().iloc[0]
    assert out["n_crosses"] == 2 and bool(out["any_crosses"])


def test_shiftxy_exact(ray_session):
    from rsgislib_ray.stages.vectorgeoms import shiftxy

    ds = ray.data.from_arrow(_rings_tbl())
    out = shiftxy(ds, 2.5, -1.25).to_pandas().sort_values(
        ["fid", "ring_id"]).reset_index(drop=True)
    assert out.loc[0, "x0"] == 2.5 and out.loc[0, "y1"] == 8.75
