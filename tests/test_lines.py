"""points_along_lines vs a per-line brute reference."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

MICRO = 1_000_000


def _verts(n_lines=40, rng_seed=5):
    rng = np.random.default_rng(rng_seed)
    rows = []
    for lid in range(1, n_lines + 1):
        nv = int(rng.integers(1, 8))
        for s in range(1, nv + 1):
            m1, m2 = int(rng.integers(0, 10000)), int(rng.integers(0, 10000))
            rows.append((lid, s, m1 / 100.0 + 0.005, m2 / 100.0 + 0.005))
    df = pd.DataFrame(rows, columns=["line_id", "seq", "x", "y"])
    return pa.Table.from_pandas(df, preserve_index=False)


def _brute(tbl, step, int_scale=200):
    df = tbl.to_pandas().sort_values(["line_id", "seq"])
    step_micro = int(round(step * MICRO))
    out = []
    for lid, g in df.groupby("line_id"):
        xs, ys = g["x"].to_numpy(), g["y"].to_numpy()
        if len(xs) < 2:
            continue
        ix = np.rint(xs * int_scale).astype(np.int64)
        iy = np.rint(ys * int_scale).astype(np.int64)
        d2 = (ix[1:] - ix[:-1]) ** 2 + (iy[1:] - iy[:-1]) ** 2
        ilen = np.floor(
            np.sqrt(d2.astype(float)) * (MICRO / int_scale)
        ).astype(np.int64)
        cum = np.concatenate([[0], np.cumsum(ilen)])
        total = cum[-1]
        k = 0
        while k * step_micro < total:
            d = k * step_micro
            si = int(np.searchsorted(cum[1:], d, side="right"))
            frac = (d - cum[si]) / ilen[si]
            out.append(
                (
                    lid,
                    k,
                    xs[si] + frac * (xs[si + 1] - xs[si]),
                    ys[si] + frac * (ys[si + 1] - ys[si]),
                    d,
                )
            )
            k += 1
    return pd.DataFrame(
        out, columns=["line_id", "pt_id", "x", "y", "dist_micro"]
    )


@pytest.mark.parametrize("blocks", [1, 11])
def test_points_along_lines_matches_brute(ray_session, blocks):
    import ray

    from rsgislib_ray.stages.lines import points_along_lines

    tbl = _verts()
    got = (
        points_along_lines(
            ray.data.from_arrow(tbl).repartition(blocks), pt_step=20.0
        )
        .to_pandas()
        .sort_values(["line_id", "pt_id"])
        .reset_index(drop=True)
    )
    want = _brute(tbl, 20.0).sort_values(["line_id", "pt_id"]).reset_index(
        drop=True
    )
    assert len(got) == len(want)
    assert got["line_id"].tolist() == want["line_id"].tolist()
    assert got["pt_id"].tolist() == want["pt_id"].tolist()
    assert got["dist_micro"].tolist() == want["dist_micro"].tolist()
    # bit-exact interpolation (same float expression)
    assert (got["x"].to_numpy() == want["x"].to_numpy()).all()
    assert (got["y"].to_numpy() == want["y"].to_numpy()).all()


def test_points_along_lines_degenerate(ray_session):
    """Single-vertex and zero-length lines emit nothing; a coincident
    duplicate vertex mid-line is skipped over."""
    import ray

    from rsgislib_ray.stages.lines import points_along_lines

    tbl = pa.table(
        {
            "line_id": np.array([1, 2, 2, 3, 3, 3], dtype=np.int64),
            "seq": np.array([1, 1, 2, 1, 2, 3], dtype=np.int64),
            "x": np.array([5.0, 7.0, 7.0, 0.005, 0.005, 30.005]),
            "y": np.array([5.0, 9.0, 9.0, 0.005, 0.005, 0.005]),
        }
    )
    got = (
        points_along_lines(ray.data.from_arrow(tbl), pt_step=10.0)
        .to_pandas()
        .sort_values(["line_id", "pt_id"])
    )
    # line 1: single vertex; line 2: zero length -> nothing
    assert set(got["line_id"]) == {3}
    # line 3: duplicate start vertex then 30 units -> k = 0, 1, 2
    assert got["pt_id"].tolist() == [0, 1, 2]
    assert got["x"].tolist() == [0.005, 10.005, 20.005]


@pytest.mark.parametrize("blocks", [1, 8])
def test_closest_line_intersections_matches_brute(ray_session, blocks):
    import ray

    from rsgislib_ray.stages.lines import closest_line_intersections

    rng = np.random.default_rng(17)

    def seg_tbl(n, ids, prefix):
        m = rng.integers(0, 10000, (n, 4))
        c = m / 100.0 + 0.005
        names = (
            ["sx", "sy", "ex", "ey"] if prefix == "b" else
            ["ax", "ay", "bx", "by"]
        )
        cols = {("uid" if prefix == "b" else "tid"): ids}
        for j, nm in enumerate(names):
            cols[nm] = c[:, j]
        return pa.table(cols)

    base = seg_tbl(200, np.arange(1, 201, dtype=np.int64), "b")
    targ = seg_tbl(60, np.arange(1, 61, dtype=np.int64), "t")
    got = (
        closest_line_intersections(
            ray.data.from_arrow(base).repartition(blocks), targ
        )
        .to_pandas()
        .sort_values("uid")
        .reset_index(drop=True)
    )

    # brute: all pairs, integer cross products
    S = 200
    bs = {k: np.rint(base[k].to_numpy() * S).astype(np.int64)
          for k in ["sx", "sy", "ex", "ey"]}
    ts = {k: np.rint(targ[k].to_numpy() * S).astype(np.int64)
          for k in ["ax", "ay", "bx", "by"]}
    rows = []
    for i in range(200):
        hits = []
        for j in range(60):
            rx, ry = bs["ex"][i] - bs["sx"][i], bs["ey"][i] - bs["sy"][i]
            wx, wy = ts["bx"][j] - ts["ax"][j], ts["by"][j] - ts["ay"][j]
            den = rx * wy - ry * wx
            if den == 0:
                continue
            qx, qy = ts["ax"][j] - bs["sx"][i], ts["ay"][j] - bs["sy"][i]
            tn = qx * wy - qy * wx
            un = qx * ry - qy * rx
            if den > 0:
                ok = 0 < tn < den and 0 < un < den
            else:
                ok = den < tn < 0 and den < un < 0
            if ok:
                hits.append((tn / den, j + 1))
        if hits:
            hits.sort()
            t0 = hits[0][0]
            rows.append((i + 1, len(hits), t0, max(h[0] for h in hits)))
    assert got["uid"].tolist() == [r[0] for r in rows]
    assert got["n_isect"].tolist() == [r[1] for r in rows]
    assert got["t"].tolist() == [r[2] for r in rows]
    assert got["t_max"].tolist() == [r[3] for r in rows]
    # point = start + t * (end - start), bit-exact
    bx = base["sx"].to_numpy()
    ex = base["ex"].to_numpy()
    for _, r in got.iterrows():
        i = int(r["uid"]) - 1
        assert r["x"] == bx[i] + r["t"] * (ex[i] - bx[i])


def test_orthogonal_lines_invariants(ray_session):
    import ray

    from rsgislib_ray.stages.lines import orthogonal_lines

    tbl = _verts(25, rng_seed=9)
    got = orthogonal_lines(
        ray.data.from_arrow(tbl).repartition(5), pt_step=25.0, line_len=3.0
    ).to_pandas()
    assert len(got) > 0
    vx, vy = got["ox"] - got["x"], got["oy"] - got["y"]
    # length == line_len
    np.testing.assert_allclose(np.hypot(vx, vy), 3.0, rtol=1e-12)
    # right-hand side: cross(dir, normal) < 0 for n=(dy,-dx)/len
    # verify on the simple 2-vertex line case instead:
    t2 = pa.table(
        {
            "line_id": np.array([1, 1], dtype=np.int64),
            "seq": np.array([1, 2], dtype=np.int64),
            "x": np.array([0.005, 50.005]),
            "y": np.array([0.005, 0.005]),
        }
    )
    g2 = orthogonal_lines(
        ray.data.from_arrow(t2), pt_step=20.0, line_len=5.0
    ).to_pandas()
    # travel east -> right-hand normal points south (negative y)
    assert (g2["oy"] < g2["y"]).all()
    g3 = orthogonal_lines(
        ray.data.from_arrow(t2), pt_step=20.0, line_len=5.0, left_hand=True
    ).to_pandas()
    assert (g3["oy"] > g3["y"]).all()
