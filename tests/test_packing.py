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


@pytest.mark.parametrize("blocks", [1, 3, 8])
def test_shuffle_shards_partition_independent(ray_session, blocks):
    """shard/pos layout must be identical under any input block layout
    and must be a valid permutation: per shard, positions are exactly
    0..count-1 ordered by (skey, doc_id)."""
    from rsgislib_ray.stages.packing import shuffle_shards

    tbl = pa.table({"doc_id": np.arange(400, dtype=np.int64)})
    ds = ray.data.from_arrow(tbl).repartition(blocks)
    out = (
        shuffle_shards(ds, n_shards=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(out) == 400
    for sh, grp in out.groupby("shard"):
        g = grp.sort_values(["skey", "doc_id"])
        assert (g["pos"].to_numpy() == np.arange(len(g))).all()
    # layout invariant across block counts: compare against 1 block
    base = (
        shuffle_shards(ray.data.from_arrow(tbl), n_shards=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert (out[["shard", "skey", "pos"]].to_numpy()
            == base[["shard", "skey", "pos"]].to_numpy()).all()


def test_chunk_documents_reconstruction(ray_session):
    """Stride-window chunks must tile each doc: first chunk starts at 0,
    starts advance by stride, last chunk ends at n_words, and each
    chunk_text round-trips the original words."""
    from rsgislib_ray.stages.text import chunk_documents

    tbl = _corpus(n=60, seed=9)
    out = (
        chunk_documents(ray.data.from_arrow(tbl), max_len=16, stride=10)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
    )
    for did, grp in out.groupby("doc_id"):
        words = tbl["text"][did].as_py().split(" ")
        n = len(words)
        assert grp["start_word"].iloc[0] == 0
        assert (np.diff(grp["start_word"].to_numpy()) == 10).all()
        assert grp["end_word"].iloc[-1] == n
        for _, r in grp.iterrows():
            assert r["chunk_text"] == " ".join(
                words[r["start_word"]: r["end_word"]]
            )
