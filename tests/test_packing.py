"""Sequence-packing (stages/packing.py) semantics + partition
independence: the global prefix sum must be identical under any block
layout of the id-ordered input."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from rsgislib_ray.stages.packing import assign_packed_bins


def _corpus(n=300, seed=5):
    rng = np.random.default_rng(seed)
    texts = [
        " ".join(f"w{j}" for j in range(int(k)))
        for k in rng.integers(1, 40, size=n)
    ]
    return pa.table({"doc_id": np.arange(n, dtype=np.int64),
                     "text": texts})


def _expected(tbl: pa.Table, budget: int):
    n_tok = np.array(
        [len(t.split(" ")) for t in tbl["text"].to_pylist()], dtype=np.int64
    )
    start = np.cumsum(n_tok) - n_tok
    return n_tok, start, start // budget


@pytest.mark.parametrize("blocks", [1, 3, 8])
def test_packing_partition_independent(ray_session, blocks):
    tbl = _corpus()
    budget = 64
    n_tok, start, bins = _expected(tbl, budget)
    ds = ray.data.from_arrow(tbl).repartition(blocks)
    out = (
        assign_packed_bins(ds, budget)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert (out["n_tokens"].to_numpy() == n_tok).all()
    assert (out["start_offset"].to_numpy() == start).all()
    assert (out["bin_id"].to_numpy() == bins).all()


def test_packing_bins_respect_budget(ray_session):
    tbl = _corpus(120, seed=9)
    budget = 100
    ds = ray.data.from_arrow(tbl)
    out = assign_packed_bins(ds, budget).to_pandas()
    # every doc's bin equals its start offset // budget, and offsets
    # are the exact concatenation order
    assert (
        out["bin_id"] == out["start_offset"] // budget
    ).all()
    total = out["n_tokens"].sum()
    assert out["start_offset"].max() < total
