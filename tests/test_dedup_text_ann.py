"""Dedup / text-analysis / ANN stages vs oracles."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from rsgislib_ray.stages.ann import ann_topk, lsh_bucket_topk
from rsgislib_ray.stages.dedup import (
    exact_dedup,
    jaccard,
    minhash_dedup,
    minhash_signatures,
    simhash_near_dup_pairs,
    simhash_signatures,
)
from rsgislib_ray.stages.text import add_quality_stats, add_token_count, add_langid


@pytest.fixture(scope="module")
def oracle(sf_dir):
    con = duckdb.connect()
    for t in ["documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _docs(sf_dir):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet")


def test_token_count_vs_oracle(ray_session, sf_dir, oracle):
    got = (
        add_token_count(_docs(sf_dir))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = oracle.execute(
        "SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens "
        "FROM documents ORDER BY doc_id"
    ).fetch_df()
    np.testing.assert_array_equal(
        got["n_tokens"].to_numpy(), want["n_tokens"].to_numpy()
    )


def test_quality_stats_vs_oracle(ray_session, sf_dir, oracle):
    got = (
        add_quality_stats(_docs(sf_dir))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = oracle.execute(
        """
        SELECT doc_id,
          CAST(length(text) AS BIGINT) AS n_chars,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
          CAST(len(list_filter(string_split(text, ' '),
               w -> w IN ('the','a','and','of','to','in','is','it'))) AS BIGINT)
            AS n_stopwords
        FROM documents ORDER BY doc_id
        """
    ).fetch_df()
    for c in ["n_chars", "n_tokens", "n_stopwords"]:
        np.testing.assert_array_equal(got[c].to_numpy(), want[c].to_numpy(), c)
    # ratio formula mirrored
    np.testing.assert_array_equal(
        got["stopword_ratio"].to_numpy(),
        want["n_stopwords"].to_numpy()
        / np.maximum(want["n_tokens"].to_numpy(), 1).astype(np.float64),
    )


def test_exact_dedup_first_wins(ray_session, sf_dir, oracle):
    docs = _docs(sf_dir)
    got = exact_dedup(docs, ["text"], id_col="doc_id").to_pandas()
    want = oracle.execute(
        "SELECT min(doc_id) AS doc_id FROM documents GROUP BY text"
    ).fetch_df()
    assert sorted(got["doc_id"].tolist()) == sorted(want["doc_id"].tolist())
    # schema preserved
    assert set(got.columns) == {"doc_id", "text", "lang", "source", "n_chars"}


def test_minhash_estimates_jaccard():
    texts = [
        "the quick brown fox jumps over the lazy dog again and again ok",
        "the quick brown fox jumps over the lazy cat again and again ok",
        "completely unrelated words appear in this document body here now",
    ]
    sig = minhash_signatures(texts, n_perm=256)
    est01 = (sig[0] == sig[1]).mean()
    true01 = jaccard(texts[0], texts[1])
    assert abs(est01 - true01) < 0.15
    est02 = (sig[0] == sig[2]).mean()
    assert est02 < 0.1


def test_minhash_dedup_finds_planted_near_dups(ray_session):
    rng = np.random.default_rng(42)
    base_words = [f"w{i}" for i in range(50)]
    docs = []
    for i in range(200):
        words = [base_words[j] for j in rng.integers(0, 50, 30)]
        docs.append(" ".join(words))
    # plant near-dups: doc 200 = copy of 0 with one word changed;
    # doc 201 = exact copy of 1
    near0 = docs[0].split(" ")
    near0[5] = "CHANGED"
    docs.append(" ".join(near0))
    docs.append(docs[1])
    ds = ray.data.from_arrow(
        pa.table({"doc_id": np.arange(len(docs), dtype=np.int64), "text": docs})
    )
    out = minhash_dedup(ds, threshold=0.6).to_pandas()
    assert len(out) == len(docs)
    c = out.set_index("doc_id")["cluster_id"]
    assert c[200] == c[0] == 0
    assert c[201] == c[1]
    keep = out.set_index("doc_id")["keep"]
    assert bool(keep[0]) and not bool(keep[200])
    # brute-force oracle: every pair with true jaccard >= threshold is clustered
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            if jaccard(docs[i], docs[j]) >= 0.9:
                assert c[i] == c[j], (i, j)


def test_simhash_near_dup(ray_session):
    docs = ["alpha beta gamma delta epsilon zeta eta theta " * 4] * 2
    docs.append(docs[0].replace("zeta", "zetaX"))
    docs.append("nothing in common with the others at all whatsoever")
    ds = ray.data.from_arrow(
        pa.table({"doc_id": np.arange(4, dtype=np.int64), "text": docs})
    )
    sigs = simhash_signatures(np.asarray(docs, dtype=object))
    assert sigs[0] == sigs[1]
    pairs = simhash_near_dup_pairs(ds, max_hamming=8).to_pandas()
    got_pairs = set(zip(pairs["doc_a"], pairs["doc_b"]))
    assert (0, 1) in got_pairs
    assert (0, 3) not in got_pairs


def test_ann_topk_vs_brute(ray_session, sf_dir):
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet")
    queries = tbl.slice(0, 4)
    got = ann_topk(emb, queries, k=5).to_pandas()
    # brute numpy oracle
    M = np.stack(tbl["embedding"].to_pandas().to_numpy()).astype(np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    ids = tbl["vec_id"].to_numpy()
    for qi in range(4):
        sims = Mn @ Mn[qi]
        order = np.lexsort((ids, -sims))[:5]
        want_ids = ids[order]
        got_ids = got[got["query_id"] == ids[qi]].sort_values("rank")["vec_id"]
        np.testing.assert_array_equal(got_ids.to_numpy(), want_ids)


def test_lsh_bucket_topk_subset_of_bucket(ray_session, sf_dir):
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet")
    queries = tbl.slice(0, 2)
    got = lsh_bucket_topk(emb, queries, k=5, n_bits=4).to_pandas()
    # each query finds at least itself (identical vector, same bucket)
    for qid in queries["vec_id"].to_pylist():
        mine = got[got["query_id"] == qid]
        assert len(mine) >= 1
        assert mine.iloc[0]["vec_id"] == qid


def test_langid_runs(ray_session, sf_dir):
    out = add_langid(_docs(sf_dir)).to_pandas()
    assert {"lang_pred", "lang_score"} <= set(out.columns)
    assert out["lang_pred"].notna().all()


def test_ivf_recall_vs_exact(ray_session, sf_dir):
    from rsgislib_ray.stages.ann import ann_topk, ivf_topk

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet")
    queries = tbl.slice(0, 8)
    exact = ann_topk(emb, queries, k=10).to_pandas()
    approx = ivf_topk(emb, queries, k=10, n_centroids=16, nprobe=4).to_pandas()
    recalls = []
    for qid in queries["vec_id"].to_pylist():
        e = set(exact[exact["query_id"] == qid]["vec_id"])
        a = set(approx[approx["query_id"] == qid]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.5, recalls
    # the query vector itself (identical) must always be found
    for qid in queries["vec_id"].to_pylist():
        assert qid in set(approx[approx["query_id"] == qid]["vec_id"])


def test_exact_dedup_join_strategy_matches_broadcast(ray_session, sf_dir):
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    a = (
        exact_dedup(docs, ["text"], strategy="broadcast")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        exact_dedup(docs, ["text"], strategy="join", num_partitions=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b[a.columns])


def test_exact_dedup_planted_dups_both_strategies(ray_session):
    """With real duplicate groups present, the dup-only winner filter
    (cnt >= 2) keeps exactly the min-id row of each group in both the
    broadcast and join strategies."""
    texts = [f"unique doc {i}" for i in range(40)] + ["dup body"] * 5 + [
        "other dup"
    ] * 3
    ids = np.arange(len(texts), dtype=np.int64)
    rng = np.random.default_rng(4)
    perm = rng.permutation(len(ids))
    ds = ray.data.from_arrow(
        pa.table({"doc_id": ids[perm], "text": np.array(texts)[perm]})
    ).repartition(4)
    want = set(range(40)) | {40, 45}
    for strat in ("broadcast", "join"):
        got = exact_dedup(ds, ["text"], strategy=strat).to_pandas()
        assert set(got["doc_id"]) == want, strat


def test_lsh_all_pairs_per_bucket(ray_session):
    """3 identical docs share every band bucket: candidates must
    contain ALL 3 pairs, not just star pairs to the bucket minimum
    (regression: star pairing silently split clusters whose members
    only verify against each other)."""
    from rsgislib_ray.stages.dedup import minhash_lsh_candidates

    text = "a b c d e f g h i j"
    ds = ray.data.from_arrow(
        pa.table({"doc_id": np.array([10, 20, 30]), "text": [text] * 3})
    )
    pairs = minhash_lsh_candidates(ds).to_pandas().drop_duplicates()
    got = set(map(tuple, pairs[["doc_a", "doc_b"]].to_numpy()))
    assert {(10, 20), (10, 30), (20, 30)} <= got


def test_verify_pairs_jaccard_distributed_matches_exact(ray_session):
    from rsgislib_ray.stages.dedup import verify_pairs_jaccard

    rng = np.random.default_rng(3)
    words = [f"w{i}" for i in range(30)]
    texts = [
        " ".join(words[j] for j in rng.integers(0, 30, 25)) for i in range(40)
    ]
    texts[35] = texts[0]  # exact dup pair
    ds = ray.data.from_arrow(
        pa.table({"doc_id": np.arange(40, dtype=np.int64), "text": texts})
    )
    ii, jj = np.triu_indices(40, k=1)
    pairs = pd.DataFrame({"doc_a": ii.astype(np.int64), "doc_b": jj.astype(np.int64)})
    thr = 0.3
    got = verify_pairs_jaccard(ds, pairs, thr, shingle_k=3)
    got_set = set(map(tuple, got[["doc_a", "doc_b"]].to_numpy().astype(int)))
    want = {
        (int(a), int(b))
        for a, b in zip(ii, jj)
        if jaccard(texts[a], texts[b], 3) >= thr
    }
    assert got_set == want
    assert (0, 35) in got_set


def test_minhash_dedup_returns_streaming_dataset(ray_session):
    """VERDICT round-2 'done' criterion: the dedup path is Dataset-only
    — labeling comes back as a streaming Dataset, never a driver-side
    materialization of the corpus."""
    import ray.data as rd

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": np.arange(100, dtype=np.int64),
                "text": [f"doc number {i} words here" for i in range(100)],
            }
        )
    ).repartition(4)
    out = minhash_dedup(ds, threshold=0.9)
    assert isinstance(out, rd.Dataset)
    assert out.count() == 100
    ex = exact_dedup(ds, ["text"])
    assert isinstance(ex, rd.Dataset)


def test_paragraph_enc_bounds_guarded():
    """The packed (doc_id, para_idx) int64 encoding raises loudly on
    out-of-range doc ids instead of silently colliding winners."""
    from rsgislib_ray.stages.dedup import _explode_paragraphs

    bad = pa.table({"doc_id": [1 << 43], "text": ["a b c d"]})
    with pytest.raises(ValueError, match="doc ids"):
        _explode_paragraphs(bad, 2, "text", "doc_id", False)
    ok = pa.table({"doc_id": [(1 << 43) - 1], "text": ["a b c d"]})
    _explode_paragraphs(ok, 2, "text", "doc_id", False)


def test_build_pyramid_coord_bounds_guarded(ray_session):
    """Negative pixel coords must raise (the OR-packed key would
    silently aggregate them under wrong pixels)."""
    from rsgislib_ray.stages.raster import build_pyramid

    ds = ray.data.from_items(
        [{"x": -1.5, "y": 2.0, "val_cents": 10}]
    )
    with pytest.raises(Exception, match="pixel coords"):
        build_pyramid(ds, levels=2).materialize()


def test_paragraph_dedup_semantics(ray_session):
    """First-occurrence paragraph dedup: unique corpus is identity
    (modulo truncated-window re-join), an exact copy vanishes, a
    suffix-mutated copy keeps only its changed tail paragraph, and
    within-doc paragraph order is preserved."""
    import ray.data

    from rsgislib_ray.stages.dedup import paragraph_dedup

    base = "w%d " * 8  # template
    docs = {
        1: " ".join(f"a{i}" for i in range(16)),       # 2 paragraphs
        2: " ".join(f"b{i}" for i in range(20)),       # 2.5 paragraphs
        3: " ".join(f"a{i}" for i in range(16)),       # exact copy of 1
        4: " ".join(f"a{i}" for i in range(16)) + " tail0 tail1",
    }
    ds = ray.data.from_items(
        [{"doc_id": k, "text": v} for k, v in sorted(docs.items())]
    ).repartition(3)
    out = (
        paragraph_dedup(ds, para_words=8)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(out.index) == [1, 2, 4]  # doc 3 vanished entirely
    assert out.loc[1, "text"] == docs[1]
    assert out.loc[1, "n_paras"] == 2
    assert out.loc[2, "text"] == docs[2]  # unique -> identity
    assert out.loc[2, "n_paras"] == 3
    # doc 4 shares its two full paragraphs with doc 1; only the tail
    # (a truncated 2-word window) survives
    assert out.loc[4, "text"] == "tail0 tail1"
    assert out.loc[4, "n_paras"] == 1


def test_paragraph_dedup_partition_independence(ray_session):
    """Same result at 1 block and 7 blocks (winner selection is a
    global min, reassembly is in-batch)."""
    import ray.data

    from rsgislib_ray.stages.dedup import paragraph_dedup

    rng = np.random.default_rng(3)
    vocab = [f"t{i}" for i in range(12)]
    rows = [
        {
            "doc_id": i,
            "text": " ".join(rng.choice(vocab, rng.integers(8, 40))),
        }
        for i in range(60)
    ]
    outs = []
    for nb in (1, 7):
        ds = ray.data.from_items(rows).repartition(nb)
        outs.append(
            paragraph_dedup(ds, para_words=4)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_pq_topk_recall_and_determinism(ray_session, sf_dir):
    import pyarrow.parquet as pq
    import pyarrow.compute as pc

    from rsgislib_ray.sources import testdata as td
    from rsgislib_ray.stages.ann import ann_topk, pq_topk

    emb = td.read_parquet_clean(f"{sf_dir}/embeddings.parquet")
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet")
    qt = tbl.filter(pc.less(tbl["vec_id"], 4))
    a1 = pq_topk(emb, qt, k=10).to_pandas()
    a2 = pq_topk(emb.repartition(3), qt, k=10).to_pandas()
    # deterministic and partition-independent
    assert a1.equals(a2)
    exact = ann_topk(emb, qt, k=10).to_pandas()
    for qid in sorted(exact["query_id"].unique()):
        e = set(exact[exact["query_id"] == qid]["vec_id"])
        a = set(a1[a1["query_id"] == qid]["vec_id"])
        assert len(e & a) / len(e) >= 0.7
    # each query returns exactly k ranked rows
    assert (a1.groupby("query_id").size() == 10).all()
    assert (
        a1.groupby("query_id")["rank"].apply(
            lambda s: (s.to_numpy() == np.arange(1, 11)).all()
        )
    ).all()


def test_exact_dedup_auto_routes_by_measured_dup_groups(
    ray_session, monkeypatch
):
    """strategy='auto' (the default) must broadcast under the
    threshold and engage the hash-join path above it (VERDICT r4 #6),
    with identical survivors either way."""
    import pyarrow as pa
    import ray.data

    import rsgislib_ray.stages.segsum as segsum
    import rsgislib_ray.stages.spatial_join as sj

    n = 200
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": [f"t{i % 40}" for i in range(n)],
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(4)

    calls = []
    real = sj._default_join_partitions

    def spy(v):
        calls.append(v)
        return real(v)

    monkeypatch.setattr(sj, "_default_join_partitions", spy)

    a = (
        exact_dedup(ds, ["text"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert calls == []  # 40 dup groups << threshold: broadcast

    monkeypatch.setattr(segsum, "AUTO_NATIVE_ROWS", 0)
    b = (
        exact_dedup(ds, ["text"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert calls, "auto above threshold must engage the join path"
    assert a.equals(b)
    assert set(a["doc_id"]) == set(range(40))
