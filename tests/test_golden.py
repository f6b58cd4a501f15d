"""Golden-value regression suite — the reference's test style
(/root/reference/python_tests/test_zonalstats.py:58-64 hardcodes
expected scalars with tight tolerances). These values were computed
once from the deterministic sf0.001 derivations and pinned; the
pipelines are fully deterministic (counter-based inputs, exact integer
aggregation), so any drift is a regression, not noise.
"""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def _run(name: str):
    from rsgislib_ray.pipelines.queries import queries

    r = queries()[name](SF)
    df = r.to_pandas() if hasattr(r, "to_pandas") else r
    return df


def test_point_extract_golden(ray_session):
    got = _run("point_extract").sort_values("pt_id").reset_index(drop=True)
    np.testing.assert_array_equal(
        got["pxl_val"].to_numpy()[:6],
        [78.0, 961.0, 144.0, 433.0, 582.0, 577.0],
    )


def test_zonal_stats_golden(ray_session):
    got = _run("zonal_stats").sort_values("fid").reset_index(drop=True)
    np.testing.assert_array_equal(got["count"].to_numpy()[:4], [9, 25, 38, 20])
    np.testing.assert_array_equal(
        got["mean"].to_numpy()[:4],
        [59699.37555555556, 62700.9372, 53037.05184210527, 58563.523],
    )
    np.testing.assert_array_equal(
        got["stddev"].to_numpy()[:4],
        [
            19341.430177340997,
            26687.366781477496,
            24713.222982071424,
            31184.191645018644,
        ],
    )


def test_tile_assign_golden(ray_session):
    got = _run("tile_assign").sort_values("pt_id").reset_index(drop=True)
    np.testing.assert_array_equal(
        got["tile_id"].to_numpy()[:8], [0, 6, 13, 5, 8, 7, 10, 5]
    )


def test_knn_golden(ray_session):
    got = _run("knn_1nn").sort_values("base_id").reset_index(drop=True)
    np.testing.assert_array_equal(got["nn_id"].to_numpy()[:4], [0, 7, 7, 7])
    np.testing.assert_array_equal(
        got["nn_dist_sq"].to_numpy()[:4],
        [0.113, 593.2546, 959.8879999999995, 2024.8898000000002],
    )
