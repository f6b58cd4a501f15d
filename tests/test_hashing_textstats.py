"""Hashing stability + text-stat kernels (no Ray)."""

import subprocess
import sys

import numpy as np
import pyarrow as pa

from rsgislib_ray.functions import hashing as H
from rsgislib_ray.functions import textstats as T


def test_hash_strings_stable_across_processes():
    vals = ["alpha", "beta", "", "gamma delta", "alpha"]
    h = H.hash_strings(vals)
    assert h[0] == h[4]
    assert len(set(h.tolist())) == 4
    # stability across interpreter processes (dedup keys must agree
    # between the 8-CPU and 32-CPU runs)
    code = (
        "from rsgislib_ray.functions.hashing import hash_strings;"
        f"print(hash_strings({vals!r}).tolist())"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, check=True,
        cwd="/root/repo",
    ).stdout.strip()
    assert out == str(h.tolist())


def test_splitmix_and_combine():
    a = np.arange(10, dtype=np.uint64)
    m = H.splitmix64(a)
    assert len(set(m.tolist())) == 10
    c1 = H.hash_combine(a, a + np.uint64(1))
    c2 = H.hash_combine(a + np.uint64(1), a)
    assert not np.array_equal(c1, c2)  # order-sensitive


def test_fingerprints_detect_equality_and_difference():
    base = "the quick brown fox jumps over the lazy dog " * 5
    texts = [base, base, base.replace("lazy", "sleepy"), "completely different words"]
    fp = H.doc_fingerprint(texts)
    assert fp[0] == fp[1]
    assert fp[0] != fp[3]
    assert np.all(fp >= 0)
    # near-dup shares most winnowed k-grams
    a = set(H.winnow_fingerprints(texts[0]).tolist())
    b = set(H.winnow_fingerprints(texts[2]).tolist())
    jac = len(a & b) / len(a | b)
    assert jac > 0.3
    c = set(H.winnow_fingerprints(texts[3]).tolist())
    assert len(a & c) / len(a | c) < 0.1


def test_token_count_matches_split_semantics():
    arr = pa.array(["a b c", "one", "", "x  y"])
    got = T.token_count(arr).to_pylist()
    assert got == [3, 1, 1, 3]  # duckdb len(string_split(.,' ')) semantics


def test_quality_stats():
    arr = pa.array(["the cat sat on a mat!", "word"])
    s = T.quality_stats(arr)
    assert s["n_tokens"].tolist() == [6, 1]
    assert s["n_stopwords"].tolist() == [2, 0]  # 'the', 'a'
    assert s["n_punct"].tolist() == [1, 0]
    assert s["stopword_ratio"][0] == 2.0 / 6.0


def test_langid_deterministic():
    texts = np.array(
        ["the thing and the other thing going strong", "der die und der schein"],
        dtype=object,
    )
    lang1, score1 = T.langid_scores(texts)
    lang2, score2 = T.langid_scores(texts)
    assert lang1.tolist() == lang2.tolist()
    assert lang1[0] == "en" and lang1[1] == "de"
    assert np.all(score1 >= 0)


def test_word_shingles():
    assert T.word_shingles(["a", "b", "c", "d"], 3) == ["a b c", "b c d"]
    assert T.word_shingles(["a"], 3) == ["a"]
    assert T.word_shingles([], 3) == []


def test_kmv_distinct_accuracy_and_merge_invariance(ray_session):
    """KMV sketch: ~1/sqrt(k) relative error and partition-independent
    (the union of per-block sketches is the sketch of the union)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from rsgislib_ray.stages.sketch import kmv_distinct_count

    keys = (np.arange(400000, dtype=np.int64) * 7919) % 60000
    true = len(np.unique(keys))
    ests = []
    for nparts in (2, 16):
        ds = ray.data.from_arrow(pa.table({"key": keys})).repartition(nparts)
        out = kmv_distinct_count(ds, "key", k=2048).to_pandas()
        ests.append(float(out["distinct_est"].iloc[0]))
        assert abs(ests[-1] - true) / true < 0.1
    assert ests[0] == ests[1]  # deterministic under partitioning


def test_hll_distinct_accuracy_and_merge_invariance(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from rsgislib_ray.stages.sketch import hll_distinct_count

    for true in (300, 80000):
        keys = (np.arange(400000, dtype=np.int64) * 31) % true
        ests = []
        for nparts in (2, 16):
            ds = ray.data.from_arrow(pa.table({"key": keys})).repartition(
                nparts
            )
            out = hll_distinct_count(ds, "key").to_pandas()
            ests.append(float(out["distinct_est"].iloc[0]))
            assert abs(ests[-1] - true) / true < 0.06
        assert ests[0] == ests[1]


def test_cms_overestimates_bounded_and_partition_invariant(ray_session):
    """CMS: estimate >= true count always; within epsilon*N slack;
    identical under any partitioning (pure integer merge)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from rsgislib_ray.stages.sketch import cms_estimate_counts

    rng = np.random.default_rng(8)
    keys = rng.zipf(1.5, 200000).astype(np.int64) % 10000
    true = np.bincount(keys, minlength=10000)
    q = np.argsort(true)[-20:].astype(np.int64)  # heavy hitters
    outs = []
    for nparts in (2, 16):
        ds = ray.data.from_arrow(pa.table({"k": keys})).repartition(nparts)
        out = cms_estimate_counts(ds, "k", q).to_pandas().sort_values("key")
        outs.append(out["est_count"].to_numpy())
        assert (outs[-1] >= true[np.sort(q)]).all()
        assert (outs[-1] - true[np.sort(q)] <= 2 * len(keys) / 2048).all()
    np.testing.assert_array_equal(outs[0], outs[1])


def test_bloom_semi_join_no_false_negatives(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from rsgislib_ray.stages.sketch import bloom_filter_semi_join

    members = np.arange(0, 5000, 7, dtype=np.int64)
    keys = np.arange(20000, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"k": keys})).repartition(6)
    out = bloom_filter_semi_join(ds, members, "k").to_pandas()
    got = set(out["k"])
    assert set(members) <= got          # no false negatives
    fp = len(got - set(members)) / len(keys)
    assert fp < 0.01                    # m=131072, d=4, n=715 -> tiny
