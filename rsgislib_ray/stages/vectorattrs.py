"""Vector attribute-table column operators (reference
``vectorattrs/__init__.py``): encounter-order unique-id columns, dict /
range / list LUT mapping, string-column sanitisation (``check_str``),
literal find-and-replace, and attribute sorts with a global rank.

Reference surface (cited per function):

- ``add_unq_numeric_col``  vectorattrs/__init__.py:580
- ``add_numeric_col_lut``  vectorattrs/__init__.py:643
- ``add_numeric_col_range_lut``  vectorattrs/__init__.py:1687
- ``add_numeric_col_from_lst_lut``  vectorattrs/__init__.py:1736
- ``check_str_col``  vectorattrs/__init__.py:1783 (via
  tools/utils.py:664 ``check_str`` + :640 ``remove_repeated_chars``)
- ``find_replace_str_vec_lyr``  vectorattrs/__init__.py:974
- ``sort_vec_lyr``  vectorattrs/__init__.py:920

Scale notes: every LUT here is bounded by the number of DISTINCT
values (or by the caller-supplied dict), so the physical plan is the
broadcast-small-side pattern — one ``map_batches`` pass emitting
per-batch (value, min_order) partials whose size is O(distinct x
blocks), a driver combine over that tiny table, one ``ray.put``, and a
second streaming pass.  No row-level shuffle anywhere; the only
all-to-all is the range-partition sort inside ``sort_with_rank``
(which IS the operator).
"""

from __future__ import annotations

import string as _string
from typing import Dict, List, Sequence, Tuple, Union

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

__all__ = [
    "add_unq_numeric_col",
    "map_col_lut",
    "map_col_range_lut",
    "map_col_lst_lut",
    "check_str_array",
    "check_str_col",
    "find_replace_str",
    "sort_with_rank",
]


# ---------------------------------------------------------------------------
# add_unq_numeric_col — encounter-order unique ids
# ---------------------------------------------------------------------------

def add_unq_numeric_col(
    ds: ray.data.Dataset,
    unq_col: str,
    order_col: str,
    out_col: str,
) -> ray.data.Dataset:
    """Numeric ids 1..n for the unique values of ``unq_col`` in
    FIRST-APPEARANCE order (``add_unq_numeric_col``,
    vectorattrs/__init__.py:580 — pandas ``.unique()`` preserves
    encounter order, so id 1 is the value seen first in file order).

    Encounter order is defined over the table ordered by
    ``order_col`` (the fixture files are written in key order, so
    this matches the reference's file-order semantics while staying
    partition-independent).  Pass 1 reduces each batch to its
    (value, min(order)) pairs — O(distinct) rows per batch — the
    driver combine keeps the global min per value and ranks by it,
    and pass 2 maps through the broadcast LUT.
    """

    def partial(batch: pa.Table) -> pa.Table:
        tbl = pa.table({"v": batch[unq_col], "o": batch[order_col]})
        agg = tbl.group_by("v").aggregate([("o", "min")])
        return agg.rename_columns(["v", "o_min"])

    parts = ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
    combined = pa.concat_tables(
        [t for t in ray.get(list(parts)) if t.num_rows]
    )
    agg = combined.group_by("v").aggregate([("o_min", "min")])
    vals = agg["v"].to_pylist()
    firsts = np.asarray(agg["o_min_min"].to_pylist())
    order = np.argsort(firsts, kind="stable")
    keys = pa.array([vals[i] for i in order])
    ids = np.arange(1, len(order) + 1, dtype=np.int64)
    lut_ref = ray.put((keys, ids))

    def apply(batch: pa.Table) -> pa.Table:
        from rsgislib_ray.state.broadcast import cached

        ks, out_ids = cached(lut_ref)
        idx = pc.index_in(batch[unq_col], value_set=ks)
        mapped = out_ids[idx.to_numpy(zero_copy_only=False)]
        return batch.append_column(out_col, pa.array(mapped, pa.int64()))

    return ds.map_batches(apply, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# dict / range / list LUT mapping
# ---------------------------------------------------------------------------

def map_col_lut(
    ds: ray.data.Dataset,
    ref_col: str,
    val_lut: Dict,
    out_col: str,
    col_dtype: str = "int",
) -> ray.data.Dataset:
    """Dict-LUT column map (``add_numeric_col_lut``,
    vectorattrs/__init__.py:643): output initialised to ZERO, each LUT
    key's matching rows overwritten — unmatched values stay 0."""
    if col_dtype.lower() not in ("int", "float"):
        raise ValueError("col_type must be int or float")
    keys = list(val_lut.keys())
    outs = [val_lut[k] for k in keys]
    out_type = pa.int64() if col_dtype.lower() == "int" else pa.float64()
    np_dtype = np.int64 if col_dtype.lower() == "int" else np.float64
    lut_ref = ray.put((keys, outs))

    def apply(batch: pa.Table) -> pa.Table:
        from rsgislib_ray.state.broadcast import cached

        ks, os_ = cached(lut_ref)
        v = batch[ref_col].to_numpy(zero_copy_only=False)
        out = np.zeros(len(v), dtype=np_dtype)
        for k, o in zip(ks, os_):
            out[v == k] = o
        return batch.append_column(out_col, pa.array(out, out_type))

    return ds.map_batches(apply, batch_format="pyarrow")


def map_col_range_lut(
    ds: ray.data.Dataset,
    vec_col: str,
    val_lut: Dict[int, Tuple[float, float]],
    out_col: str,
) -> ray.data.Dataset:
    """Range-LUT column map (``add_numeric_col_range_lut``,
    vectorattrs/__init__.py:1687): zeros, then each dict entry sets
    rows with lo <= v < hi to its key IN DICT ORDER — overlapping
    ranges resolve LAST-ENTRY-WINS (the reference overwrites in the
    loop)."""
    entries = [(int(k), float(lo), float(hi)) for k, (lo, hi) in val_lut.items()]
    lut_ref = ray.put(entries)

    def apply(batch: pa.Table) -> pa.Table:
        from rsgislib_ray.state.broadcast import cached

        ents = cached(lut_ref)
        v = batch[vec_col].to_numpy(zero_copy_only=False)
        out = np.zeros(len(v), dtype=np.int64)
        for key, lo, hi in ents:
            out[(v >= lo) & (v < hi)] = key
        return batch.append_column(out_col, pa.array(out, pa.int64()))

    return ds.map_batches(apply, batch_format="pyarrow")


def map_col_lst_lut(
    ds: ray.data.Dataset,
    ref_col: str,
    vals_lut: List[Tuple[Union[str, int], int]],
    out_col: str,
) -> ray.data.Dataset:
    """List-LUT column map (``add_numeric_col_from_lst_lut``,
    vectorattrs/__init__.py:1736): zeros, each (lookup, out) tuple
    applied in list order — a repeated lookup value resolves
    LAST-ENTRY-WINS."""
    lut_ref = ray.put(list(vals_lut))

    def apply(batch: pa.Table) -> pa.Table:
        from rsgislib_ray.state.broadcast import cached

        ents = cached(lut_ref)
        v = batch[ref_col].to_numpy(zero_copy_only=False)
        out = np.zeros(len(v), dtype=np.int64)
        for k, o in ents:
            out[v == k] = o
        return batch.append_column(out_col, pa.array(out, pa.int64()))

    return ds.map_batches(apply, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# check_str / find-replace string sanitisation
# ---------------------------------------------------------------------------

# string.punctuation minus '_' and '-', regex-escaped, as a character
# class (tools/utils.py:711 loops string.punctuation skipping both).
_PUNC_NO_DASH_UNDERSCORE = "".join(
    c for c in _string.punctuation if c not in "_-"
)
_PUNC_CLASS = "[" + "".join(
    "\\" + c if c in "\\]^[" else c for c in _PUNC_NO_DASH_UNDERSCORE
) + "]"


def check_str_array(
    arr: pa.Array,
    rm_non_ascii: bool = False,
    rm_dashs: bool = False,
    rm_spaces: bool = False,
    rm_punc: bool = False,
) -> pa.Array:
    """Vectorized ``tools.utils.check_str`` (tools/utils.py:664): strip,
    then optionally (in this exact order) drop non-printable-ASCII
    chars, dash->underscore + collapse, space->underscore + collapse,
    strip punctuation (keeping '_'/'-') + collapse.

    ``remove_repeated_chars`` (tools/utils.py:640) collapses CONSECUTIVE
    repeats only, which is exactly ``regexp_replace('_{2,}', '_')``.
    Arrow's RE2 and DuckDB's regex agree on every class used here, so
    the SQL oracle mirrors this chain verbatim.  Inputs must use plain
    spaces at the edges (Python ``strip()`` takes all unicode
    whitespace; the fixture guarantees spaces only).
    """
    s = pc.utf8_trim_whitespace(arr)
    if rm_non_ascii:
        # printable ASCII = 0x20..0x7E = letters+digits+punct+space
        s = pc.replace_substring_regex(s, pattern="[^ -~]", replacement="")
    if rm_dashs:
        s = pc.replace_substring(s, pattern="-", replacement="_")
        s = pc.replace_substring_regex(s, pattern="_{2,}", replacement="_")
    if rm_spaces:
        s = pc.replace_substring(s, pattern=" ", replacement="_")
        s = pc.replace_substring_regex(s, pattern="_{2,}", replacement="_")
    if rm_punc:
        s = pc.replace_substring_regex(s, pattern=_PUNC_CLASS, replacement="")
        s = pc.replace_substring_regex(s, pattern="_{2,}", replacement="_")
    return s


def check_str_col(
    ds: ray.data.Dataset,
    vec_col: str,
    rm_non_ascii: bool = True,
    rm_dashs: bool = False,
    rm_spaces: bool = False,
    rm_punc: bool = False,
) -> ray.data.Dataset:
    """``check_str_col`` (vectorattrs/__init__.py:1783): apply
    ``check_str`` to every value of ``vec_col`` in place.  One
    zero-shuffle vectorized pass (the reference loops rows in
    Python)."""

    def apply(batch: pa.Table) -> pa.Table:
        cleaned = check_str_array(
            batch[vec_col],
            rm_non_ascii=rm_non_ascii,
            rm_dashs=rm_dashs,
            rm_spaces=rm_spaces,
            rm_punc=rm_punc,
        )
        i = batch.schema.get_field_index(vec_col)
        return batch.set_column(i, vec_col, cleaned)

    return ds.map_batches(apply, batch_format="pyarrow")


def find_replace_str(
    ds: ray.data.Dataset,
    cols: Sequence[str],
    find_replace: Dict[str, str],
) -> ray.data.Dataset:
    """``find_replace_str_vec_lyr`` (vectorattrs/__init__.py:974):
    literal substring replace (pandas ``str.replace`` with the modern
    ``regex=False`` default), every occurrence, applied per column in
    dict order — a later pair sees the earlier pair's output."""
    pairs = list(find_replace.items())

    def apply(batch: pa.Table) -> pa.Table:
        for col in cols:
            s = batch[col]
            for find_val, repl in pairs:
                s = pc.replace_substring(s, pattern=find_val, replacement=repl)
            i = batch.schema.get_field_index(col)
            batch = batch.set_column(i, col, s)
        return batch

    return ds.map_batches(apply, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# sort_vec_lyr with a global rank column
# ---------------------------------------------------------------------------

def sort_with_rank(
    ds: ray.data.Dataset,
    sort_key_col: str,
    rank_col: str = "row_rank",
) -> ray.data.Dataset:
    """``sort_vec_lyr`` (vectorattrs/__init__.py:920) with the output
    order made checkable: range-partition sort on a STRICT composite
    key column (the caller encodes the multi-column asc/desc spec into
    one order-preserving int64, tie-broken by a unique id), then
    1-based global row ranks via the two-level scan — per-block
    (min_key, count) summaries (two ints per block to the driver),
    cumsum offsets, and a per-block realignment pass keyed by the
    block's min key.  Mirrors ``ROW_NUMBER() OVER (ORDER BY ...)``.
    """
    sorted_ds = ds.sort(sort_key_col)
    refs = list(sorted_ds.to_arrow_refs())

    @ray.remote(num_cpus=0.25)
    def summarize(tbl: pa.Table):
        if tbl.num_rows == 0:
            return None
        k = tbl[sort_key_col].to_numpy()
        return int(k.min()), int(tbl.num_rows)

    summaries = [s for s in ray.get([summarize.remote(r) for r in refs]) if s]
    order = np.argsort([s[0] for s in summaries], kind="stable")
    counts = np.array([summaries[i][1] for i in order], dtype=np.int64)
    bases = np.concatenate([[0], np.cumsum(counts)[:-1]])
    min_keys = np.array([summaries[i][0] for i in order], dtype=np.int64)
    base_ref = ray.put((min_keys, bases))

    def tag(batch: pa.Table) -> pa.Table:
        from rsgislib_ray.state.broadcast import cached

        mks, bs = cached(base_ref)
        if len(batch) == 0:
            return batch.append_column(rank_col, pa.array([], pa.int64()))
        k = batch[sort_key_col].to_numpy()
        pos = np.searchsorted(mks, k.min())
        local = np.argsort(np.argsort(k, kind="stable"), kind="stable")
        rank = bs[pos] + local + 1
        return batch.append_column(rank_col, pa.array(rank, pa.int64()))

    from ray.data import from_arrow_refs

    # batch == block so tag's base lookup stays per-block (strict keys
    # mean within-block order is already sorted; argsort is identity
    # but kept for batch-split safety).
    return from_arrow_refs(refs).map_batches(
        tag, batch_format="pyarrow", batch_size=None
    )
