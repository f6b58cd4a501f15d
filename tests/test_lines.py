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
