"""Attribute-subset / row-drop / attribute-dedup / deterministic
sampling operators (reference ``vectorutils/__init__.py``):

- ``subset_by_attribute``  vectorutils/__init__.py:2688 — per-value
  selections CONCATENATED in list order (a row matching several
  values appears once per match — multiset semantics pinned)
- ``select_feats_str_search``  vectorutils/__init__.py:2755
- ``drop_rows_by_attribute``  vectorutils/__init__.py:2794
- ``rm_attrib_duplicates``  vectorutils/__init__.py:3666 — pandas
  ``drop_duplicates(subset=cols, keep='first'|'last'|False)``
- ``create_train_test_valid_smpls``  vectorutils/__init__.py:3365 —
  incl. the reference's literal index arithmetic: the TRAIN frame is
  ``full.drop(valid.index)``, i.e. train INCLUDES the test rows
- ``create_n_random_subsets``  vectorutils/__init__.py:3758

Pandas RNG draws are replaced by the repo's deterministic splitmix64
rank schedule (the established convention): "the k smallest by
(splitmix64(x), id)" stands in for "sample(k)".  Exact-count selection
runs through :func:`rsgislib_ray.stages.classify.group_rank_thresholds`
(two-level 16-bit-bucket histogram + boundary pull), so no global sort
and no driver materialization of row data.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from rsgislib_ray.functions.hashing import splitmix64

__all__ = [
    "subset_by_attribute",
    "select_feats_str_search",
    "drop_rows_by_attribute",
    "rm_attrib_duplicates",
    "train_test_valid_split_exact",
    "n_random_subsets",
]


def subset_by_attribute(
    ds: ray.data.Dataset,
    sub_col: str,
    sub_vals: Sequence,
    match_type: str = "equals",
) -> ray.data.Dataset:
    """``subset_by_attribute`` (vectorutils:2688): one selection per
    value, results concatenated in LIST ORDER — a row matching several
    values is emitted once per match.  ``contains``/``start`` take the
    plain-substring / plain-prefix subset of the reference's regex
    support (fixture contract; pass regex via the text stage if
    needed)."""
    match_type = match_type.lower()
    if match_type not in ("equals", "contains", "start"):
        raise ValueError(
            "The match_type must be either 'equals', 'contains' or 'start'"
        )
    vals = list(sub_vals)

    def f(batch: pa.Table) -> pa.Table:
        outs = []
        col = batch[sub_col]
        for v in vals:
            if match_type == "equals":
                m = pc.equal(col, v)
            elif match_type == "contains":
                m = pc.match_substring(col, v)
            else:
                m = pc.starts_with(col, v)
            outs.append(batch.filter(pc.fill_null(m, False)))
        return pa.concat_tables(outs)

    return ds.map_batches(f, batch_format="pyarrow")


def select_feats_str_search(
    ds: ray.data.Dataset, select_col: str, select_val: str
) -> ray.data.Dataset:
    """``select_feats_str_search`` (vectorutils:2755): fillna('') then
    case-sensitive substring containment."""

    def f(batch: pa.Table) -> pa.Table:
        col = pc.fill_null(batch[select_col], "")
        return batch.filter(pc.match_substring(col, select_val))

    return ds.map_batches(f, batch_format="pyarrow")


def drop_rows_by_attribute(
    ds: ray.data.Dataset, sub_col: str, sub_vals: Sequence
) -> ray.data.Dataset:
    """``drop_rows_by_attribute`` (vectorutils:2794): drop rows whose
    value equals ANY of the listed values."""
    val_arr = pa.array(list(sub_vals))

    def f(batch: pa.Table) -> pa.Table:
        drop = pc.is_in(batch[sub_col], value_set=val_arr)
        return batch.filter(pc.invert(pc.fill_null(drop, False)))

    return ds.map_batches(f, batch_format="pyarrow")


def rm_attrib_duplicates(
    ds: ray.data.Dataset,
    dup_cols: List[str],
    order_col: str,
    keep_rows: str = "First",
) -> ray.data.Dataset:
    """``rm_attrib_duplicates`` (vectorutils:3666): pandas
    ``drop_duplicates(subset=dup_cols, keep=...)`` with file order
    defined by ``order_col`` (unique).  First/Last route through the
    distributed first-wins dedup (``stages/dedup.exact_dedup`` —
    per-batch (hash, min_order) partials + segment-sum winner
    selection); Last negates the order key.  RemoveAll keeps only
    singleton groups: dup hashes (count >= 2) are the broadcast small
    side, rows filter locally."""
    if keep_rows not in ("First", "Last", "RemoveAll"):
        raise ValueError(
            "keep_rows option must be one of: First, Last, RemoveAll"
        )
    from rsgislib_ray.stages.dedup import add_content_hash, exact_dedup

    if keep_rows in ("First", "Last"):
        sign = 1 if keep_rows == "First" else -1

        def tag(batch: pa.Table) -> pa.Table:
            o = batch[order_col].to_numpy().astype(np.int64)
            return batch.append_column(
                "__ord", pa.array(sign * o, pa.int64())
            )

        out = exact_dedup(
            ds.map_batches(tag, batch_format="pyarrow"),
            dup_cols,
            id_col="__ord",
        )
        return out.drop_columns(["__ord"])

    hashed = add_content_hash(ds, dup_cols)

    def partial(batch: pa.Table) -> pa.Table:
        h = batch["content_hash"].to_numpy()
        hs = np.sort(h)
        starts = np.concatenate([[0], np.flatnonzero(np.diff(hs)) + 1])
        ends = np.concatenate([starts[1:], [len(hs)]])
        return pa.table(
            {
                "h": hs[starts],
                "cnt": (ends - starts).astype(np.int64),
            }
        )

    from rsgislib_ray.stages.segsum import segment_sum

    counts = segment_sum(
        hashed.map_batches(partial, batch_format="pyarrow"), "h", ["cnt"]
    )

    def dup_only(batch: pa.Table) -> pa.Table:
        m = batch["cnt"].to_numpy() >= 2
        return pa.table({"h": batch["h"].to_numpy()[m]})

    dup_blocks = [
        t
        for t in ray.get(
            list(
                counts.map_batches(
                    dup_only, batch_format="pyarrow"
                ).to_arrow_refs()
            )
        )
        if t.num_rows
    ]
    dup_sorted = (
        np.sort(pa.concat_tables(dup_blocks)["h"].to_numpy())
        if dup_blocks
        else np.empty(0, dtype=np.int64)
    )
    dup_ref = ray.put(dup_sorted)

    def filt(batch: pa.Table) -> pa.Table:
        from rsgislib_ray.state.broadcast import cached

        dups = cached(dup_ref)
        h = batch["content_hash"].to_numpy()
        pos = np.searchsorted(dups, h)
        is_dup = (pos < len(dups)) & (dups[np.minimum(pos, len(dups) - 1)] == h)
        return batch.filter(pa.array(~is_dup))

    return hashed.map_batches(filt, batch_format="pyarrow").drop_columns(
        ["content_hash"]
    )


def train_test_valid_split_exact(
    ds: ray.data.Dataset,
    id_col: str,
    prop_test: float = 0.2,
    prop_valid: float = 0.2,
) -> ray.data.Dataset:
    """``create_train_test_valid_smpls`` (vectorutils:3365) with the
    pandas RNG replaced by the deterministic (splitmix64(id), id)
    ascending order: test = the first ``int(n*prop_test)`` rows,
    valid = the next ``int(n*prop_valid)``, and — the reference's
    literal index arithmetic, pinned — train = EVERYTHING except
    valid (``smpl_pts_remain_gdf = smpl_pts_gdf.drop(valid.index)``
    drops only the valid rows, so the test rows stay in train).
    Emits boolean ``is_test / is_valid / is_train`` columns."""
    from rsgislib_ray.stages.classify import group_rank_thresholds

    n = ds.count()
    n_test = int(n * prop_test)
    n_valid = int(n * prop_valid)

    def keyed(batch: pa.Table) -> pa.Table:
        i = batch[id_col].to_numpy().astype(np.int64)
        z = splitmix64(i.astype(np.uint64))
        return pa.table(
            {
                id_col: batch[id_col],
                "__cls": pa.array(np.zeros(len(i), np.int64)),
                "__z": pa.array(z.astype(np.int64)),
                "__tie": pa.array(i),
            }
        )

    kds = ds.map_batches(keyed, batch_format="pyarrow")
    thr_test = group_rank_thresholds(kds, "__cls", "__z", "__tie",
                                     {0: n_test})[0]
    thr_tv = group_rank_thresholds(kds, "__cls", "__z", "__tie",
                                   {0: n_test + n_valid})[0]

    def sel(z, t, thr):
        zt, tt, empty = thr
        if empty:
            return np.zeros(len(z), dtype=bool)
        zt = np.uint64(zt)
        return (z < zt) | ((z == zt) & (t <= tt))

    def label(batch: pa.Table) -> pa.Table:
        i = batch[id_col].to_numpy().astype(np.int64)
        z = splitmix64(i.astype(np.uint64))
        is_test = sel(z, i, thr_test)
        in_tv = sel(z, i, thr_tv)
        is_valid = in_tv & ~is_test
        return pa.table(
            {
                id_col: batch[id_col],
                "is_test": pa.array(is_test),
                "is_valid": pa.array(is_valid),
                "is_train": pa.array(~is_valid),
            }
        )

    return ds.map_batches(label, batch_format="pyarrow")


def n_random_subsets(
    ds: ray.data.Dataset,
    id_col: str,
    n_subs: int = 4,
    smpl_frac: float = 0.5,
) -> ray.data.Dataset:
    """``create_n_random_subsets`` (vectorutils:3758), frac path,
    without replacement: subset ``i`` keeps the ``round(frac*n)``
    smallest rows by (splitmix64(id*n_subs + i), id) — one
    deterministic stream per subset replacing the pandas
    ``sample(frac=...)`` draw (with a fixed ``random_state`` the
    reference would emit IDENTICAL subsets; the indexed stream keeps
    the subsets distinct, documented deviation shared by the SQL
    oracle).  Emits (subset, id) rows."""
    from rsgislib_ray.stages.classify import group_rank_thresholds

    n = ds.count()
    k = int(round(smpl_frac * n))

    def expand(batch: pa.Table) -> pa.Table:
        i = batch[id_col].to_numpy().astype(np.int64)
        reps = np.repeat(i, n_subs)
        sub = np.tile(np.arange(n_subs, dtype=np.int64), len(i))
        z = splitmix64((reps * n_subs + sub).astype(np.uint64))
        return pa.table(
            {
                "subset": pa.array(sub),
                "id": pa.array(reps),
                "__z": pa.array(z.astype(np.int64)),
                "__tie": pa.array(reps),
            }
        )

    eds = ds.map_batches(expand, batch_format="pyarrow")
    thr = group_rank_thresholds(
        eds, "subset", "__z", "__tie", {i: k for i in range(n_subs)}
    )

    def filt(batch: pa.Table) -> pa.Table:
        sub = batch["subset"].to_numpy()
        z = batch["__z"].to_numpy().astype(np.uint64)
        t = batch["__tie"].to_numpy()
        keep = np.zeros(len(sub), dtype=bool)
        for i, (zt, tt, empty) in thr.items():
            if empty:
                continue
            zt = np.uint64(zt)
            keep |= (sub == i) & ((z < zt) | ((z == zt) & (t <= tt)))
        return pa.table(
            {"subset": batch["subset"].filter(pa.array(keep)),
             "id": batch["id"].filter(pa.array(keep))}
        )

    return eds.map_batches(filt, batch_format="pyarrow")
