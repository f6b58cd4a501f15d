"""Registration stage invariants: planted-shift recovery, scalar
brute-force parity for all four similarity metrics, coregistration
equivalence, and partition independence."""

import numpy as np
import pyarrow as pa
import pytest

from rsgislib_ray.stages import registration as reg


def _sparse_points(rng, h, w, density=0.7, vmax=100):
    mask = rng.random((h, w)) < density
    r, c = np.nonzero(mask)
    v = rng.integers(1, vmax, len(r))
    return r.astype(np.int64), c.astype(np.int64), v.astype(np.int64)


def _co_table(r, c, v, dy, dx, h, w):
    """Driver-side reference coregistration: rv from (r,c,v), fv from
    the same grid sampled at (row+dy, col+dx)."""
    rv = np.zeros((h, w), dtype=np.int64)
    nr = np.zeros((h, w), dtype=np.int64)
    rv[r, c] += v
    nr[r, c] += 1
    fv = np.zeros((h, w), dtype=np.int64)
    nf = np.zeros((h, w), dtype=np.int64)
    r2, c2 = r - dy, c - dx
    ok = (r2 >= 0) & (r2 < h) & (c2 >= 0) & (c2 < w)
    np.add.at(fv, (r2[ok], c2[ok]), v[ok])
    np.add.at(nf, (r2[ok], c2[ok]), 1)
    rows, cols = np.nonzero((nr > 0) | (nf > 0))
    return pa.table(
        {
            "row": rows.astype(np.int64),
            "col": cols.astype(np.int64),
            "rv": rv[rows, cols],
            "fv": fv[rows, cols],
            "nr": nr[rows, cols],
            "nf": nf[rows, cols],
        }
    ), (rv, fv, nr > 0, nf > 0)


def _scalar_best(grids, tie_r, tie_c, w, S, metric):
    rv, fv, pr, pf = grids
    h, ww = rv.shape
    best = None
    for sy in range(-S, S + 1):
        for sx in range(-S, S + 1):
            n = 0
            ss = sa = srf = sr = sf = srr = sff = 0
            for wy in range(-w, w + 1):
                for wx in range(-w, w + 1):
                    rr, cc = tie_r + wy, tie_c + wx
                    r2, c2 = rr + sy, cc + sx
                    if not (0 <= rr < h and 0 <= cc < ww):
                        continue
                    if not (0 <= r2 < h and 0 <= c2 < ww):
                        continue
                    if not (pr[rr, cc] and pf[r2, c2]):
                        continue
                    a, b = int(rv[rr, cc]), int(fv[r2, c2])
                    n += 1
                    ss += (a - b) * (a - b)
                    sa += abs(a - b)
                    srf += a * b
                    sr += a
                    sf += b
                    srr += a * a
                    sff += b * b
            if n == 0:
                continue
            nn = float(n)
            if metric == "sqdiff":
                val = ss / nn
            elif metric == "euclidean":
                val = np.sqrt(ss / nn)
            elif metric == "manhattan":
                val = sa / nn
            else:
                val = ((nn * srf) - (sr * sf)) / np.sqrt(
                    ((nn * srr) - (sr * sr)) * ((nn * sff) - (sf * sf))
                )
            better = (
                best is None
                or (metric == "correlation" and val > best[2])
                or (metric != "correlation" and val < best[2])
            )
            if better:
                best = (sy, sx, val, n)
    return best


def test_tie_grid():
    g = reg.tie_grid(96, 24)
    assert g.tolist() == [12, 36, 60, 84]
    assert reg.tie_grid(10, 3).tolist() == [2, 5, 8]


@pytest.mark.parametrize(
    "metric", ["sqdiff", "euclidean", "manhattan", "correlation"]
)
def test_find_tie_points_vs_scalar(ray_session, metric):
    import ray.data

    rng = np.random.default_rng(23)
    h = w = 96
    dy, dx = 2, -1
    r, c, v = _sparse_points(rng, h, w)
    co_tbl, grids = _co_table(r, c, v, dy, dx, h, w)
    co = ray.data.from_arrow(co_tbl).repartition(4)
    got = (
        reg.find_tie_points(
            co, h, w, gap=24, window_size=2, search_area=3,
            metric=metric,
        )
        .to_pandas()
        .sort_values(["tie_row", "tie_col"])
        .reset_index(drop=True)
    )
    assert len(got) == 16
    for _i, row in got.iterrows():
        want = _scalar_best(
            grids, int(row["tie_row"]), int(row["tie_col"]), 2, 3,
            metric,
        )
        assert (int(row["sy"]), int(row["sx"])) == (want[0], want[1])
        assert row["metric"] == pytest.approx(want[2], rel=1e-12)
        assert int(row["n_pairs"]) == want[3]
    # the planted shift is recovered at (almost) every tie point for
    # the distance metrics (exact-match minimum = 0)
    if metric == "sqdiff":
        hits = (
            (got["sy"].to_numpy() == -dy) & (got["sx"].to_numpy() == -dx)
        ).sum()
        assert hits >= 14


def test_coregister_shifted_matches_reference(ray_session):
    import ray.data

    rng = np.random.default_rng(31)
    h = w = 64
    dy, dx = -1, 2
    r, c, v = _sparse_points(rng, h, w, density=0.5)
    want_tbl, _ = _co_table(r, c, v, dy, dx, h, w)
    pts = ray.data.from_arrow(
        pa.table({"row": r, "col": c, "v": v})
    ).repartition(5)
    got = (
        reg.coregister_shifted(pts, dy, dx, h, w)
        .to_pandas()
        .sort_values(["row", "col"])
        .reset_index(drop=True)
    )
    want = (
        want_tbl.to_pandas()
        .sort_values(["row", "col"])
        .reset_index(drop=True)
    )
    assert (got.to_numpy() == want.to_numpy()).all()


def test_stddev_culling_and_threshold(ray_session):
    import ray.data

    rng = np.random.default_rng(41)
    h = w = 96
    r, c, v = _sparse_points(rng, h, w, density=1.0)
    # make one tie-point neighbourhood constant -> zero stddev
    flat = (np.abs(r - 12) <= 5) & (np.abs(c - 12) <= 5)
    v = v.copy()
    v[flat] = 7
    co_tbl, _ = _co_table(r, c, v, 0, 0, h, w)
    co = ray.data.from_arrow(co_tbl).repartition(3)
    got = reg.find_tie_points(
        co, h, w, gap=24, window_size=2, search_area=1,
        metric="sqdiff", stddev_ref_threshold=0.5,
    ).to_pandas()
    keys = set(zip(got["tie_row"], got["tie_col"]))
    assert (12, 12) not in keys
    assert len(got) == 15
    # identical images: best shift (0,0), metric 0; a strict
    # threshold < 0 then kills everything
    assert (got["sy"] == 0).all() and (got["sx"] == 0).all()
    assert (got["metric"] == 0.0).all()
    got2 = reg.find_tie_points(
        co, h, w, gap=24, window_size=2, search_area=1,
        metric="sqdiff", metric_threshold=-1.0,
    ).to_pandas()
    assert len(got2) == 0


def test_partition_independence(ray_session):
    import ray.data

    rng = np.random.default_rng(51)
    h = w = 96
    r, c, v = _sparse_points(rng, h, w)
    co_tbl, _ = _co_table(r, c, v, 1, 1, h, w)
    outs = []
    for parts in (1, 9):
        co = ray.data.from_arrow(co_tbl).repartition(parts)
        outs.append(
            reg.find_tie_points(
                co, h, w, gap=16, window_size=2, search_area=2
            )
            .to_pandas()
            .sort_values(["tie_row", "tie_col"])
            .reset_index(drop=True)
        )
    assert (outs[0].to_numpy() == outs[1].to_numpy()).all()


def test_apply_offset(ray_session):
    import ray.data

    t = pa.table(
        {"x": [1.0, 2.5], "y": [3.0, -1.0], "v": [1, 2]}
    )
    out = (
        reg.apply_offset_to_image(
            ray.data.from_arrow(t), 0.5, -2.0
        )
        .to_pandas()
        .sort_values("v")
    )
    assert out["x"].tolist() == [1.5, 3.0]
    assert out["y"].tolist() == [1.0, -3.0]
