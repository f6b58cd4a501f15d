"""Tests for stages/vectorattrs.py — the vectorattrs LUT / string /
sort family (reference vectorattrs/__init__.py:580,643,1687,1736,
1783,974,920 and tools/utils.py:664,640).

The check_str tests use a direct line-by-line Python transcription of
the reference's scalar implementation as an independent oracle.
"""

import string

import numpy as np
import pyarrow as pa
import pytest

import ray.data


# --- direct transcription of tools/utils.py:640 + :664 -------------------

def _ref_remove_repeated_chars(str_val, repeat_char):
    out_str = ""
    p = ""
    for c in str_val:
        if c == repeat_char:
            if c != p:
                out_str += c
        else:
            out_str += c
        p = c
    return out_str


def _ref_check_str(str_val, rm_non_ascii=False, rm_dashs=False,
                   rm_spaces=False, rm_punc=False):
    if str_val is None:
        str_val = ""
    s = str_val.strip()
    if rm_non_ascii:
        s = "".join(
            c for c in s
            if (c in string.ascii_letters) or (c in string.punctuation)
            or (c in string.digits) or (c == " ")
        )
    if rm_dashs:
        s = _ref_remove_repeated_chars(s.replace("-", "_"), "_")
    if rm_spaces:
        s = _ref_remove_repeated_chars(s.replace(" ", "_"), "_")
    if rm_punc:
        for punct in string.punctuation:
            if punct not in ("_", "-"):
                s = s.replace(punct, "")
        s = _ref_remove_repeated_chars(s, "_")
    return s


CASES = [
    "  hello - world--x  ",
    "café µunit #tag!!",
    "a--b---c----d",
    "   ",
    "plain",
    "under__score  and -- dash",
    "#punc.only;here:",
    "tab nbspX",  # nbsp is non-ascii -> dropped
]


@pytest.mark.parametrize("flags", [
    dict(rm_non_ascii=True),
    dict(rm_non_ascii=True, rm_dashs=True),
    dict(rm_non_ascii=True, rm_spaces=True),
    dict(rm_non_ascii=True, rm_punc=True),
    dict(rm_non_ascii=True, rm_dashs=True, rm_spaces=True, rm_punc=True),
])
def test_check_str_matches_reference_transcription(flags):
    from rsgislib_ray.stages.vectorattrs import check_str_array

    got = check_str_array(pa.array(CASES), **flags).to_pylist()
    want = [_ref_check_str(c, **flags) for c in CASES]
    assert got == want


def test_remove_repeated_collapse_regex_equivalence():
    import pyarrow.compute as pc

    vals = ["x--y---z", "-", "--", "a-b", "", "----"]
    got = pc.replace_substring_regex(
        pa.array(vals), pattern="-{2,}", replacement="-"
    ).to_pylist()
    want = [_ref_remove_repeated_chars(v, "-") for v in vals]
    assert got == want


def test_unq_numeric_encounter_order_partition_independent(ray_session):
    from rsgislib_ray.stages.vectorattrs import add_unq_numeric_col

    # value first seen (by order col) -> id 1, etc.
    order = np.arange(40)
    vals = np.array(
        ["b", "d", "a", "c"], dtype=object
    )[np.array([0, 0, 1, 2, 3, 0, 2, 1] * 5)]
    tbl = pa.table({"k": order, "v": pa.array(vals, pa.string())})
    expected = {"b": 1, "d": 2, "a": 3, "c": 4}
    for parts in (1, 3, 7):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        out = add_unq_numeric_col(ds, "v", "k", "vid").to_pandas()
        out = out.sort_values("k")
        assert [expected[v] for v in out["v"]] == out["vid"].tolist()


def test_range_and_lst_lut_last_wins(ray_session):
    from rsgislib_ray.stages.vectorattrs import (
        map_col_lst_lut,
        map_col_range_lut,
    )

    tbl = pa.table({"v": [0.0, 100.0, 600.0, 2500.0, 9999.0, -5.0],
                    "s": ["A", "B", "A", "C", "B", "A"]})
    ds = ray.data.from_arrow(tbl).repartition(2)
    out = map_col_range_lut(
        ds, "v", {1: (0, 1000), 2: (2000, 3000), 9: (-10, 200)}, "c"
    ).to_pandas().sort_values("v")
    # -5 -> 9; 0,100 -> 9 (entry 9 overwrites entry 1); 600 -> 1;
    # 2500 -> 2; 9999 -> 0
    assert out["c"].tolist() == [9, 9, 9, 1, 2, 0]

    out2 = map_col_lst_lut(
        ds, "s", [("A", 1), ("B", 2), ("A", 5)], "c"
    ).to_pandas()
    assert (
        out2.loc[out2["s"] == "A", "c"].eq(5).all()
        and out2.loc[out2["s"] == "B", "c"].eq(2).all()
        and out2.loc[out2["s"] == "C", "c"].eq(0).all()
    )


def test_map_col_lut_default_zero_and_float(ray_session):
    from rsgislib_ray.stages.vectorattrs import map_col_lut

    tbl = pa.table({"s": ["x", "y", "z", "x"]})
    ds = ray.data.from_arrow(tbl)
    out = map_col_lut(ds, "s", {"x": 1.5, "y": -2.0}, "c",
                      col_dtype="float").to_pandas()
    assert out["c"].tolist() == [1.5, -2.0, 0.0, 1.5]
    with pytest.raises(ValueError):
        map_col_lut(ds, "s", {}, "c", col_dtype="str")


def test_sort_with_rank_matches_pandas(ray_session):
    from rsgislib_ray.stages.vectorattrs import sort_with_rank

    rng = np.random.default_rng(7)
    n = 500
    key = rng.permutation(n).astype(np.int64)
    tbl = pa.table({"id": np.arange(n), "sort_key": key})
    for parts in (1, 4, 9):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        out = sort_with_rank(ds, "sort_key").to_pandas()
        out = out.sort_values("sort_key")
        assert out["row_rank"].tolist() == list(range(1, n + 1))


def test_find_replace_sequential(ray_session):
    from rsgislib_ray.stages.vectorattrs import find_replace_str

    tbl = pa.table({"a": ["1-NOT SPECIFIED", "2-HIGH", "NA"],
                    "b": ["NA-NA", "ok", "-"]})
    ds = ray.data.from_arrow(tbl)
    out = find_replace_str(
        ds, ["a", "b"], {"-": "_", "NOT SPECIFIED": "NS", "NA": "missing"}
    ).to_pandas()
    assert out["a"].tolist() == ["1_NS", "2_HIGH", "missing"]
    assert out["b"].tolist() == ["missing_missing", "ok", "_"]
