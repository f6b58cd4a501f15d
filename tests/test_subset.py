"""Tests for stages/subset.py — vectorutils attribute subset / dedup /
deterministic sampling (reference vectorutils/__init__.py:2688,2755,
2794,3666,3365,3758)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from rsgislib_ray.functions.hashing import splitmix64


def _tbl():
    return pa.table(
        {
            "id": pa.array(np.arange(12), pa.int64()),
            "s": ["aa", "ab", "ba", "bb", "aa", "ab",
                  "ba", "bb", "aa", "ab", "ba", "bb"],
            "g": pa.array([0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 6], pa.int64()),
        }
    )


def test_subset_multiset_semantics(ray_session):
    from rsgislib_ray.stages.subset import subset_by_attribute

    ds = ray.data.from_arrow(_tbl()).repartition(3)
    # 'a' (contains) matches aa, ab, ba; 'b' matches ab, ba, bb.
    # ab/ba rows match BOTH -> appear twice (pandas.concat multiset).
    out = subset_by_attribute(ds, "s", ["a", "b"], "contains").to_pandas()
    counts = out.groupby("id").size()
    df = _tbl().to_pandas()
    for i, s in zip(df["id"], df["s"]):
        want = int("a" in s) + int("b" in s)
        assert counts.get(i, 0) == want
    # equals / start
    eq = subset_by_attribute(ds, "s", ["aa"], "equals").to_pandas()
    assert set(eq["id"]) == {0, 4, 8}
    st = subset_by_attribute(ds, "s", ["b"], "start").to_pandas()
    assert set(st["id"]) == {2, 3, 6, 7, 10, 11}
    with pytest.raises(ValueError):
        subset_by_attribute(ds, "s", ["x"], "regex")


def test_rm_attrib_duplicates_matches_pandas(ray_session):
    from rsgislib_ray.stages.subset import rm_attrib_duplicates

    df = _tbl().to_pandas().sort_values("id")
    for keep, pd_keep in [("First", "first"), ("Last", "last"),
                          ("RemoveAll", False)]:
        want = df.drop_duplicates(subset=["g"], keep=pd_keep)
        for parts in (1, 4):
            ds = ray.data.from_arrow(_tbl()).repartition(parts)
            got = rm_attrib_duplicates(ds, ["g"], "id", keep).to_pandas()
            assert sorted(got["id"]) == sorted(want["id"]), keep
    with pytest.raises(ValueError):
        rm_attrib_duplicates(ray.data.from_arrow(_tbl()), ["g"], "id", "x")


def test_train_test_valid_quirk(ray_session):
    from rsgislib_ray.stages.subset import train_test_valid_split_exact

    tbl = pa.table({"id": pa.array(np.arange(100), pa.int64())})
    ds = ray.data.from_arrow(tbl).repartition(4)
    out = train_test_valid_split_exact(ds, "id", 0.2, 0.2).to_pandas()
    assert out["is_test"].sum() == 20
    assert out["is_valid"].sum() == 20
    # the reference quirk: train = everything minus valid, so every
    # test row is ALSO a train row
    assert out["is_train"].sum() == 80
    assert (out.loc[out["is_test"], "is_train"]).all()
    assert not (out["is_test"] & out["is_valid"]).any()
    # selection = the 20 smallest by (splitmix64(id), id)
    h = splitmix64(np.arange(100).astype(np.uint64))
    order = np.lexsort((np.arange(100), h))
    want_test = set(order[:20])
    got_test = set(out.loc[out["is_test"], "id"])
    assert got_test == want_test


def test_n_random_subsets_counts_and_determinism(ray_session):
    from rsgislib_ray.stages.subset import n_random_subsets

    tbl = pa.table({"id": pa.array(np.arange(200), pa.int64())})
    for parts in (1, 5):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        out = n_random_subsets(ds, "id", n_subs=3, smpl_frac=0.5).to_pandas()
        sizes = out.groupby("subset").size()
        assert (sizes == 100).all() and len(sizes) == 3
        # subsets must be distinct streams
        s0 = set(out.loc[out["subset"] == 0, "id"])
        s1 = set(out.loc[out["subset"] == 1, "id"])
        assert s0 != s1
        # deterministic witness: subset i keeps the 100 smallest by
        # (splitmix64(id*3+i), id)
        for i in range(3):
            h = splitmix64((np.arange(200) * 3 + i).astype(np.uint64))
            order = np.lexsort((np.arange(200), h))
            assert set(out.loc[out["subset"] == i, "id"]) == set(order[:100])


def test_drop_and_search(ray_session):
    from rsgislib_ray.stages.subset import (
        drop_rows_by_attribute,
        select_feats_str_search,
    )

    tbl = pa.table({"id": [1, 2, 3, 4],
                    "s": ["River Amazon", None, "Lake", "River Severn"]})
    ds = ray.data.from_arrow(tbl)
    out = select_feats_str_search(ds, "s", "River").to_pandas()
    assert sorted(out["id"]) == [1, 4]
    out2 = drop_rows_by_attribute(ds, "s", ["Lake"]).to_pandas()
    assert sorted(out2["id"]) == [1, 2, 4]
