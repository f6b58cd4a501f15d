"""Spatial join vs DuckDB oracle + broadcast/partitioned equivalence."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from rsgislib_ray.sources import testdata as td
from rsgislib_ray.stages.spatial_join import (
    count_points_per_zone,
    spatial_join_points,
    spatial_join_points_partitioned,
)


@pytest.fixture(scope="module")
def oracle(sf_dir):
    con = duckdb.connect()
    for t in ["orders", "part", "supplier", "customer", "lineitem"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _oracle_pairs(con):
    return con.execute(
        f"""
        WITH pts AS ({td.SQL_PTS}), zones AS ({td.SQL_ZONES})
        SELECT p.pt_id, z.fid FROM pts p JOIN zones z
          ON p.x > z.xmin AND p.x < z.xmax AND p.y > z.ymin AND p.y < z.ymax
        ORDER BY p.pt_id, z.fid
        """
    ).fetch_arrow_table()


def test_inner_join_matches_oracle(ray_session, sf_dir, oracle):
    pts = td.points_from_orders(sf_dir)
    zones = td.zones_from_part(sf_dir)
    out = (
        spatial_join_points(pts, zones, how="inner", zone_prefix="z_")
        .to_pandas()
        .sort_values(["pt_id", "z_fid"])
        .reset_index(drop=True)
    )
    want = _oracle_pairs(oracle).to_pandas()
    assert len(out) == len(want) > 0
    np.testing.assert_array_equal(out["pt_id"].to_numpy(), want["pt_id"].to_numpy())
    np.testing.assert_array_equal(out["z_fid"].to_numpy(), want["fid"].to_numpy())


def test_left_and_semi_and_anti(ray_session, sf_dir, oracle):
    pts = td.points_from_orders(sf_dir)
    zones = td.zones_from_part(sf_dir)
    n_pts = pts.count()
    pairs = _oracle_pairs(oracle).to_pandas()
    matched_ids = set(pairs["pt_id"].tolist())

    left = spatial_join_points(pts, zones, how="left", zone_prefix="z_").to_pandas()
    # every point appears; unmatched points exactly once with null fid
    assert set(left["pt_id"]) == set(range(1, 1 + 0)) or len(
        set(left["pt_id"])
    ) == n_pts
    null_rows = left[left["z_fid"].isna()]
    assert set(null_rows["pt_id"]).isdisjoint(matched_ids)
    assert len(left) == len(pairs) + (n_pts - len(matched_ids))

    semi = spatial_join_points(pts, zones, how="semi").to_pandas()
    assert len(semi) == n_pts
    assert set(semi[semi["in_zone"]]["pt_id"]) == matched_ids

    anti = spatial_join_points(pts, zones, how="anti").to_pandas()
    assert set(anti["pt_id"]) == set(semi["pt_id"]) - matched_ids


def test_zone_attrs_passthrough(ray_session, sf_dir):
    pts = td.points_from_orders(sf_dir)
    zones = td.zones_from_part(sf_dir)
    out = spatial_join_points(
        pts, zones, how="inner", attr_cols=["category"], zone_prefix="z_"
    ).to_pandas()
    k = out["z_fid"].to_numpy()
    np.testing.assert_array_equal(out["z_category"].to_numpy(), (k % 5).astype(np.int32))


def test_count_points_per_zone_matches_oracle(ray_session, sf_dir, oracle):
    pts = td.points_from_orders(sf_dir)
    zones = td.zones_from_part(sf_dir)
    got = (
        count_points_per_zone(pts, zones)
        .to_pandas()
        .sort_values("fid")
        .reset_index(drop=True)
    )
    want = oracle.execute(
        f"""
        WITH pts AS ({td.SQL_PTS}), zones AS ({td.SQL_ZONES})
        SELECT z.fid, count(p.pt_id) AS n_points
        FROM zones z LEFT JOIN pts p
          ON p.x > z.xmin AND p.x < z.xmax AND p.y > z.ymin AND p.y < z.ymax
        GROUP BY z.fid ORDER BY z.fid
        """
    ).fetch_df()
    np.testing.assert_array_equal(got["fid"].to_numpy(), want["fid"].to_numpy())
    np.testing.assert_array_equal(
        got["n_points"].to_numpy(), want["n_points"].to_numpy()
    )


def test_partitioned_equals_broadcast(ray_session, sf_dir):
    import ray.data

    pts = td.points_from_orders(sf_dir)

    def add_key(t: pa.Table) -> pa.Table:
        return t.append_column("pt_row", t["pt_id"])

    pts_k = pts.map_batches(add_key, batch_format="pyarrow")
    zones = td.zones_from_part(sf_dir)
    bc = spatial_join_points(pts_k, zones, how="inner").to_pandas()
    bc_pairs = sorted(zip(bc["pt_row"], bc["fid"]))
    part = spatial_join_points_partitioned(
        pts_k, zones, level=5, key_col="pt_row"
    ).to_pandas()
    part_pairs = sorted(zip(part["pt_row"], part["fid"]))
    assert bc_pairs == part_pairs


def test_rect_fastpath_matches_ray_crossing(ray_session):
    """Rectangle fast-path must equal points_in_ring exactly, including
    boundary points (half-open edge rule)."""
    import numpy as np
    from rsgislib_ray.functions.geom import points_in_ring, rect_ring
    from rsgislib_ray.stages.spatial_join import ZoneSet

    rings = np.concatenate(
        [rect_ring(2, 3, 8, 9), rect_ring(5, 5, 10, 10),
         np.array([1.0, 1.0, 9.0, 2.0, 5.0, 9.0, 1.0, 1.0])]  # non-rect quad
    )
    tbl = pa.table(
        {
            "fid": pa.array([0, 1, 2], pa.int64()),
            "ring_xy": pa.ListArray.from_arrays(
                pa.array([0, 8, 16, 24]), pa.array(rings)
            ),
        }
    )
    zs = ZoneSet.from_table(tbl)
    assert zs.is_rect.tolist() == [True, True, False]
    rng = np.random.default_rng(0)
    # mix random and exact-boundary points
    px = np.concatenate([rng.uniform(0, 11, 500), [2.0, 8.0, 5.0, 2.0], [8.0]])
    py = np.concatenate([rng.uniform(0, 11, 500), [3.0, 9.0, 5.0, 9.0], [3.0]])
    tree = zs.build_tree()
    pi, zi = zs.match_points(tree, px, py)
    got = set(zip(pi.tolist(), zi.tolist()))
    want = set()
    for z in range(3):
        ring = rings[8 * z : 8 * z + (8 if z < 2 else 8)]
        inside = points_in_ring(px, py, ring)
        want |= {(int(p), z) for p in np.flatnonzero(inside)}
    assert got == want


def test_hashjoin_equals_broadcast(ray_session, sf_dir):
    from rsgislib_ray.stages.spatial_join import spatial_join_points_hashjoin

    pts = td.points_from_orders(sf_dir)

    def add_key(t: pa.Table) -> pa.Table:
        return t.append_column("pt_row", t["pt_id"])

    pts_k = pts.map_batches(add_key, batch_format="pyarrow")
    zones = td.zones_from_part(sf_dir)
    bc = spatial_join_points(pts_k, zones, how="inner").to_pandas()
    bc_pairs = sorted(zip(bc["pt_row"], bc["fid"]))
    hj = spatial_join_points_hashjoin(
        pts_k, zones, level=5, key_col="pt_row", num_partitions=8
    ).to_pandas()
    hj_pairs = sorted(zip(hj["pt_row"], hj["fid"]))
    assert bc_pairs == hj_pairs


def test_all_join_strategies_equal(ray_session, sf_dir):
    """broadcast / groupby / native-hash / pack / sort-merge must
    produce identical (point, zone) pair sets."""
    import numpy as np
    import pyarrow as pa

    from rsgislib_ray.sources import testdata as td
    from rsgislib_ray.stages.spatial_join import (
        spatial_join_points,
        spatial_join_points_hashjoin,
        spatial_join_points_packjoin,
        spatial_join_points_sortmerge,
    )

    zones = td.zones_from_part(sf_dir)
    pts = td.points_from_orders(sf_dir).map_batches(
        lambda t: t.append_column("pt_row", t["pt_id"]), batch_format="pyarrow"
    ).materialize()
    base = spatial_join_points(pts, zones, how="inner").to_pandas()
    want = sorted(zip(base["pt_id"], base["fid"]))
    for fn in (
        spatial_join_points_hashjoin,
        spatial_join_points_packjoin,
        spatial_join_points_sortmerge,
    ):
        got = fn(pts, zones, level=6, key_col="pt_row").to_pandas()
        assert sorted(zip(got["pt_row"], got["fid"])) == want, fn.__name__


def test_sortmerge_how_modes(ray_session, sf_dir):
    """sortmerge left/semi/anti agree with the broadcast join."""
    import numpy as np

    from rsgislib_ray.sources import testdata as td
    from rsgislib_ray.stages.spatial_join import (
        spatial_join_points,
        spatial_join_points_sortmerge,
    )

    zones = td.zones_from_part(sf_dir)
    pts = td.points_from_orders(sf_dir).map_batches(
        lambda t: t.append_column("pt_row", t["pt_id"]), batch_format="pyarrow"
    ).materialize()
    n_pts = pts.count()
    semi_b = spatial_join_points(pts, zones, how="semi").to_pandas()
    matched_b = set(semi_b[semi_b["in_zone"]]["pt_id"])
    semi = spatial_join_points_sortmerge(
        pts, zones, how="semi", key_col="pt_row"
    ).to_pandas()
    assert set(semi["pt_row"]) == matched_b
    anti = spatial_join_points_sortmerge(
        pts, zones, how="anti", key_col="pt_row"
    ).to_pandas()
    assert set(anti["pt_row"]) == set(semi_b["pt_id"]) - matched_b
    assert len(semi) + len(anti) == n_pts
    left = spatial_join_points_sortmerge(
        pts, zones, how="left", key_col="pt_row"
    ).to_pandas()
    inner = spatial_join_points_sortmerge(
        pts, zones, how="inner", key_col="pt_row"
    ).to_pandas()
    assert len(left) == len(inner) + len(anti)
    assert (left["fid"] == -1).sum() == len(anti)


def test_spatial_join_auto_selects_and_matches(ray_session, sf_dir):
    """auto: broadcast below the zone limit (same rows as explicit
    broadcast); monkeypatched limit forces the sort-merge branch."""
    import numpy as np

    import rsgislib_ray.stages.spatial_join as sj
    from rsgislib_ray.sources import testdata as td

    zones = td.zones_from_part(sf_dir)
    pts = td.points_from_orders(sf_dir).map_batches(
        lambda t: t.append_column("pt_row", t["pt_id"]), batch_format="pyarrow"
    ).materialize()
    base = sj.spatial_join_points(pts, zones, how="inner").to_pandas()
    want = sorted(zip(base["pt_id"], base["fid"]))
    got_b = sj.spatial_join_auto(pts, zones).to_pandas()
    assert sorted(zip(got_b["pt_id"], got_b["fid"])) == want
    old = sj.BROADCAST_ZONE_LIMIT
    sj.BROADCAST_ZONE_LIMIT = 1  # force the sort-merge branch
    try:
        got_s = sj.spatial_join_auto(pts, zones).to_pandas()
    finally:
        sj.BROADCAST_ZONE_LIMIT = old
    assert sorted(zip(got_s["pt_row"], got_s["fid"])) == want


def test_pip_count_native_combine_equals_driver(ray_session, sf_dir):
    from rsgislib_ray.sources import testdata as td
    from rsgislib_ray.stages.spatial_join import count_points_per_zone

    pts = td.points_from_orders(sf_dir)
    zones = td.zones_from_part(sf_dir)
    a = count_points_per_zone(pts, zones).to_pandas().sort_values("fid")
    b = (
        count_points_per_zone(pts, zones, combine="native")
        .to_pandas()
        .sort_values("fid")
    )
    import pandas as pd

    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )


def test_sortmerge_with_attrs_matches_broadcast(ray_session, sf_dir):
    """sortmerge pairs + attach_zone_attrs == broadcast inner join with
    inline attr copy."""
    from rsgislib_ray.sources import testdata as td
    from rsgislib_ray.stages.spatial_join import (
        attach_zone_attrs,
        spatial_join_points,
        spatial_join_points_sortmerge,
    )

    zones = td.zones_from_part(sf_dir)
    pts = td.points_from_orders(sf_dir).map_batches(
        lambda t: t.append_column("pt_row", t["pt_id"]), batch_format="pyarrow"
    ).materialize()
    base = spatial_join_points(
        pts, zones, how="inner", attr_cols=["category"], zone_prefix="zone_"
    ).to_pandas()
    want = sorted(zip(base["pt_id"], base["zone_fid"], base["zone_category"]))
    pairs = spatial_join_points_sortmerge(pts, zones, key_col="pt_row")
    got = attach_zone_attrs(pairs, zones, ["category"]).to_pandas()
    assert sorted(zip(got["pt_row"], got["fid"], got["zone_category"])) == want


def test_sortmerge_hot_cell_salting(ray_session, sf_dir):
    """VERDICT r3 #9: a pathological corpus (one cell holding ~30% of
    points) through the sort-merge strategy with hot-cell salting —
    pair set identical to the unsalted path and to the broadcast join,
    for inner and left."""
    import ray.data

    from rsgislib_ray.stages.spatial_join import (
        spatial_join_points,
        spatial_join_points_sortmerge,
    )

    pts = td.points_from_orders(sf_dir).to_pandas()
    x = pts["x"].to_numpy().copy()
    y = pts["y"].to_numpy().copy()
    pid = pts["pt_id"].to_numpy()
    hotm = pid % 10 < 3  # ~30% of points collapse into [50, 51)^2
    x[hotm] = 50.0 + (x[hotm] - np.floor(x[hotm]))
    y[hotm] = 50.0 + (y[hotm] - np.floor(y[hotm]))
    skew = pa.table({"pt_row": pid, "x": x, "y": y})
    zones = td.zones_from_part(sf_dir)

    def pairs(how, salt):
        ds = ray.data.from_arrow(skew).repartition(8)
        out = spatial_join_points_sortmerge(
            ds, zones, level=6, key_col="pt_row", how=how,
            salt_threshold=salt,
        ).to_pandas()
        return sorted(zip(out["pt_row"], out["fid"]))

    for how in ("inner", "left"):
        unsalted = pairs(how, None)
        salted = pairs(how, 200)  # hot cell >> 200 rows -> salting engages
        assert salted == unsalted, how

    # broadcast reference for inner
    bro = spatial_join_points(
        ray.data.from_arrow(skew).repartition(8), zones
    ).to_pandas()
    assert sorted(zip(bro["pt_row"], bro["fid"])) == pairs("inner", None)

    # the skew probe really sees a hot cell at this threshold
    from rsgislib_ray.functions.cells import cells_from_xy

    cell = cells_from_xy(x, y, 6)
    _, counts = np.unique(cell[cell != -1], return_counts=True)
    assert counts.max() > 200


def test_salting_engages_and_bounds_cells(ray_session, sf_dir, monkeypatch):
    """VERDICT r4 #7: prove the adaptive hot-cell split actually
    ENGAGES (the broadcast salt plan contains the hot cell with a
    salt count > 1) and that the post-split per-(cell, salt) group
    size is bounded by the threshold for uncapped cells."""
    import ray as _r
    import ray.data

    from rsgislib_ray.functions import cells as cellmod
    from rsgislib_ray.stages.spatial_join import (
        spatial_join_points_sortmerge,
    )

    pts = td.points_from_orders(sf_dir).to_pandas()
    x = pts["x"].to_numpy().copy()
    y = pts["y"].to_numpy().copy()
    pid = pts["pt_id"].to_numpy()
    hotm = pid % 10 < 3
    x[hotm] = 50.0 + (x[hotm] - np.floor(x[hotm]))
    y[hotm] = 50.0 + (y[hotm] - np.floor(y[hotm]))
    skew = pa.table({"pt_row": pid, "x": x, "y": y})
    zones = td.zones_from_part(sf_dir)

    captured = {}
    orig_put = _r.put

    def spy(obj, *a, **k):
        if (
            isinstance(obj, tuple)
            and len(obj) == 2
            and hasattr(obj[0], "dtype")
            and hasattr(obj[1], "dtype")
        ):
            captured["plan"] = obj
        return orig_put(obj, *a, **k)

    monkeypatch.setattr(_r, "put", spy)
    ds = ray.data.from_arrow(skew).repartition(8)
    out = spatial_join_points_sortmerge(
        ds, zones, level=6, key_col="pt_row", salt_threshold=200
    )
    out.count()
    assert "plan" in captured, "salt plan must be built"
    hcells, s = captured["plan"]
    assert len(hcells) >= 1 and (s > 1).any()
    # recompute true cell counts; every detected hot cell must exceed
    # the threshold, and uncapped splits bound the group size
    cell = cellmod.cells_from_xy(x, y, 6)
    u, c = np.unique(cell[cell != -1], return_counts=True)
    n_of = dict(zip(u.tolist(), c.tolist()))
    for hc, si in zip(hcells.tolist(), s.tolist()):
        n = n_of[hc]
        assert n > 200
        if si < 64:  # not capped (max_salt default)
            assert -(-n // si) <= 200
