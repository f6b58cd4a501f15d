"""Deduplication stages for the documents table.

The reference's dedup surface is exact attribute dedup
(``rm_feat_att_duplicates`` — pandas drop_duplicates on a column
subset, /root/reference/python/rsgislib/vectorutils/__init__.py:3443;
join-dedup vectorattrs/__init__.py:1216) and spatial thinning
(vectorgeoms/__init__.py:3621). A 100 TB training-data pipeline needs
the near-dup family too, so this module adds MinHash+LSH, SimHash and
n-gram-Jaccard verification as first-class Ray Data stages.

Scale shapes:
- exact: content-hash in ``map_batches`` (vectorized stable SipHash) ->
  ``groupby(hash)`` -> first-wins (min doc_id) — one shuffle of
  (hash, id) pairs only.
- minhash-lsh: per-batch signature matrix (segmented-min over shingle
  hashes — no per-doc loop), explode to (band, band_hash, doc_id) rows,
  ``groupby(band key)`` emits candidate pairs, exact-Jaccard verify,
  then greedy min-label clustering. Candidate volume is bounded by the
  band structure, not O(n^2).
- simhash: 64-bit signature per doc; near-dup candidates via 4x16-bit
  band buckets (Hamming radius <= 3 guaranteed candidate recall).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from rsgislib_ray.functions.hashing import hash_combine, hash_strings, splitmix64
from rsgislib_ray.functions.textstats import word_shingles

_U = np.uint64
_MERSENNE = (1 << 61) - 1


def add_content_hash(
    ds: ray.data.Dataset, cols: list[str], out_col: str = "content_hash"
) -> ray.data.Dataset:
    """Stable combined hash of the listed columns (order-sensitive)."""

    def tag(batch: pa.Table) -> pa.Table:
        h = np.zeros(len(batch), dtype=np.uint64)
        for c in cols:
            vals = batch[c].cast(pa.string()).to_numpy(zero_copy_only=False)
            h = splitmix64(h ^ hash_strings(vals))
        return batch.append_column(out_col, pa.array(h.astype(np.int64)))

    return ds.map_batches(tag, batch_format="pyarrow")


def exact_dedup(
    ds: ray.data.Dataset,
    cols: list[str],
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """First-wins exact dedup on a column subset
    (rm_feat_att_duplicates semantics: keep the lowest-id row of each
    duplicate group). Returns the surviving rows.

    Shape: per-batch partial (hash, min_id) -> min-combine ->
    broadcast the winning (hash, id) pairs -> vectorized filter. The
    only all-to-all is over one row per distinct hash per batch; the
    wide rows never shuffle. (When the distinct-hash set itself exceeds
    broadcast size, swap the driver combine for
    ``groupby("content_hash").aggregate(Min)`` plus a hash-partitioned
    semi-join — identical semantics.)"""
    hashed = add_content_hash(ds, cols)

    def partial(batch: pa.Table) -> pa.Table:
        h = batch["content_hash"].to_numpy()
        i = batch[id_col].to_numpy()
        order = np.lexsort((i, h))
        h2, i2 = h[order], i[order]
        starts = np.concatenate([[0], np.flatnonzero(np.diff(h2)) + 1])
        return pa.table({"content_hash": h2[starts], "min_id": i2[starts]})

    winners = (
        hashed.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .to_pandas()
        .groupby("content_hash", as_index=False)["min_id"]
        .min()
    )
    wh = winners["content_hash"].to_numpy()
    wi = winners["min_id"].to_numpy()
    order = np.argsort(wh, kind="stable")
    ref = ray.put((wh[order], wi[order]))

    def keep(batch: pa.Table) -> pa.Table:
        from rsgislib_ray.state.broadcast import cached

        kh, ki = cached(ref)
        h = batch["content_hash"].to_numpy()
        i = batch[id_col].to_numpy()
        pos = np.searchsorted(kh, h)
        ok = ki[pos] == i
        return batch.filter(pa.array(ok)).drop_columns(["content_hash"])

    return hashed.map_batches(keep, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _minhash_params(n_perm: int, seed: int = 7):
    h = splitmix64(np.arange(2 * n_perm, dtype=np.uint64) + _U(seed))
    a = (h[:n_perm] | _U(1)) % _U(_MERSENNE)
    b = h[n_perm:] % _U(_MERSENNE)
    return a, b


def minhash_signatures(
    texts, n_perm: int = 128, shingle_k: int = 3, seed: int = 7
) -> np.ndarray:
    """(n_docs, n_perm) uint64 MinHash signature matrix, computed with
    one exploded shingle-hash array + ``np.minimum.reduceat`` per
    permutation — vectorized across ALL docs in the batch."""
    a, b = _minhash_params(n_perm, seed)
    tok_lists = [
        word_shingles(t.split(" "), shingle_k) if t else [] for t in texts
    ]
    counts = np.array([max(len(t), 1) for t in tok_lists], dtype=np.int64)
    flat = [s for lst in tok_lists for s in (lst if lst else [""])]
    sh = hash_strings(flat) % _U(_MERSENNE)
    starts = np.cumsum(counts) - counts
    sig = np.empty((len(texts), n_perm), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for p in range(n_perm):
            hp = (a[p] * sh + b[p]) % _U(_MERSENNE)
            sig[:, p] = np.minimum.reduceat(hp, starts)
    return sig


def _band_rows(
    ids: np.ndarray, sig: np.ndarray, n_bands: int
) -> pa.Table:
    n, n_perm = sig.shape
    rows_per_band = n_perm // n_bands
    band_id = []
    band_hash = []
    doc = []
    for bnd in range(n_bands):
        seg = sig[:, bnd * rows_per_band : (bnd + 1) * rows_per_band]
        h = np.zeros(n, dtype=np.uint64)
        for j in range(rows_per_band):
            h = splitmix64(h ^ seg[:, j])
        band_id.append(np.full(n, bnd, dtype=np.int64))
        band_hash.append(h.astype(np.int64))
        doc.append(ids)
    return pa.table(
        {
            "band_id": np.concatenate(band_id),
            "band_hash": np.concatenate(band_hash),
            "doc_id": np.concatenate(doc),
        }
    )


def jaccard(a: str, b: str, shingle_k: int = 3) -> float:
    sa = set(word_shingles(a.split(" "), shingle_k))
    sb = set(word_shingles(b.split(" "), shingle_k))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(len(sa | sb), 1)


def minhash_lsh_candidates(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_perm: int = 128,
    n_bands: int = 16,
    shingle_k: int = 3,
) -> pa.Table:
    """Candidate near-dup pairs (doc_a != doc_b, star per bucket) from
    banded MinHash.

    Bucket pairing is SORT-based, not per-group map_groups (which pays
    per-bucket Python overhead across tens of thousands of buckets):
    sort band rows by bucket key, emit star pairs per sorted RUN inside
    each block vectorized, and stitch runs that span block boundaries
    by connecting the per-(block, bucket) minima on the driver (one row
    per run — tiny). Connectivity is preserved: every bucket member
    links to its block-run minimum, and the block minima of one bucket
    link to each other.
    """

    def to_bands(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_numpy(zero_copy_only=False)
        ids = batch[id_col].to_numpy()
        sig = minhash_signatures(texts, n_perm, shingle_k)
        t = _band_rows(ids, sig, n_bands)
        key = hash_combine(
            t["band_id"].to_numpy().astype(np.uint64),
            t["band_hash"].to_numpy().astype(np.uint64),
        ).astype(np.int64)
        return pa.table({"bucket": key, "doc_id": t["doc_id"]})

    bands = ds.map_batches(to_bands, batch_format="pyarrow", batch_size=4096)
    sorted_bands = bands.sort("bucket")

    def emit(batch: pa.Table) -> pa.Table:
        k = batch["bucket"].to_numpy()
        d = batch["doc_id"].to_numpy()
        order = np.lexsort((d, k))
        k2, d2 = k[order], d[order]
        new = np.concatenate([[True], k2[1:] != k2[:-1]])
        starts = np.flatnonzero(new)
        counts = np.diff(np.concatenate([starts, [len(k2)]]))
        a = np.repeat(d2[starts], counts)
        keep = a != d2
        pairs_a = a[keep]
        pairs_b = d2[keep]
        # run summaries for cross-block stitching (kind=1 rows)
        return pa.table(
            {
                "doc_a": np.concatenate([pairs_a, d2[starts]]),
                "doc_b": np.concatenate([pairs_b, d2[starts]]),
                "bucket": np.concatenate(
                    [np.zeros(len(pairs_a), dtype=np.int64), k2[starts]]
                ),
                "is_summary": np.concatenate(
                    [
                        np.zeros(len(pairs_a), dtype=np.int8),
                        np.ones(len(starts), dtype=np.int8),
                    ]
                ),
            }
        )

    both = sorted_bands.map_batches(emit, batch_format="pyarrow").to_pandas()
    pairs = both[both["is_summary"] == 0][["doc_a", "doc_b"]]
    summ = both[both["is_summary"] == 1]
    # connect per-block minima of the same bucket
    extra = []
    for _bucket, g in summ.groupby("bucket"):
        mins = np.sort(g["doc_a"].unique())
        if len(mins) > 1:
            extra.append(
                pd.DataFrame({"doc_a": mins[0], "doc_b": mins[1:]})
            )
    if extra:
        pairs = pd.concat([pairs] + extra, ignore_index=True)
    pairs = pairs.drop_duplicates().reset_index(drop=True)
    return pa.Table.from_pandas(pairs, preserve_index=False)


def minhash_dedup(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    n_perm: int = 128,
    n_bands: int = 16,
    shingle_k: int = 3,
) -> pa.Table:
    """Near-dup clustering: LSH candidates -> exact-Jaccard verify ->
    union-find -> keep the lowest id per cluster.

    Returns (doc_id, cluster_id, keep). The verified pair set is far
    smaller than the corpus (banded LSH bounds it); union-find runs on
    the driver over that contracted pair list — the documented
    assumption (matches the guide's candidate-set-small pattern). The
    heavy stages (signatures, banding, verification) are distributed.
    """
    texts_needed = ds.select_columns([id_col, text_col])
    pairs = minhash_lsh_candidates(
        texts_needed, text_col, id_col, n_perm, n_bands, shingle_k
    )

    # The candidate PAIR list is small (bounded by band collisions);
    # only texts of candidate ids are pulled to the driver for exact
    # Jaccard verification — the corpus itself keeps streaming.
    pdf = pairs.to_pandas().drop_duplicates()
    cand_ids = set(pdf["doc_a"]).union(pdf["doc_b"])
    if len(pdf):
        cand_arr = pa.array(sorted(cand_ids))
        cand_texts = texts_needed.map_batches(
            lambda t: t.filter(pa.compute.is_in(t[id_col], value_set=cand_arr)),
            batch_format="pyarrow",
        ).to_pandas()
        id_text = cand_texts.set_index(id_col)[text_col].to_dict()
        keep_mask = [
            jaccard(id_text[a], id_text[b], shingle_k) >= threshold
            for a, b in zip(pdf["doc_a"], pdf["doc_b"])
        ]
        pdf = pdf[np.asarray(keep_mask, dtype=bool)]

    # Union-find over verified pairs.
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(pdf["doc_a"], pdf["doc_b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra <= rb else (rb, ra)
            parent[hi] = lo

    # Emit one row per doc. Only candidate ids can be non-singleton, so
    # the union-find map is tiny; the id sweep itself is a narrow
    # single-column pull (at true 10^12 scale this final labeling step
    # becomes a broadcast-map over the id column instead — same logic).
    all_ids = sorted(
        texts_needed.select_columns([id_col]).to_pandas()[id_col].tolist()
    )
    cluster = [find(i) for i in all_ids]
    keep = [c == i for i, c in zip(all_ids, cluster)]
    return pa.table({id_col: all_ids, "cluster_id": cluster, "keep": keep})


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_signatures(texts) -> np.ndarray:
    """64-bit SimHash over whitespace tokens (unit weights) — bit b of
    the signature is 1 iff the sum of (+-1) votes of token-hash bit b
    is positive. Vectorized: explode tokens, bit-unpack, segment-sum."""
    tok_lists = [t.split(" ") if t else [""] for t in texts]
    counts = np.array([len(t) for t in tok_lists], dtype=np.int64)
    flat = [w for lst in tok_lists for w in lst]
    th = hash_strings(flat)
    bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & _U(1)).astype(
        np.int64
    )
    votes = bits * 2 - 1
    starts = np.cumsum(counts) - counts
    seg = np.add.reduceat(votes, starts, axis=0)
    sig = (seg > 0).astype(np.uint64)
    out = np.zeros(len(texts), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for b in range(64):
            out |= sig[:, b] << _U(b)
    return out


def add_simhash(
    ds: ray.data.Dataset, text_col: str = "text", out_col: str = "simhash"
) -> ray.data.Dataset:
    def tag(batch: pa.Table) -> pa.Table:
        sig = simhash_signatures(batch[text_col].to_numpy(zero_copy_only=False))
        return batch.append_column(out_col, pa.array(sig.astype(np.int64)))

    return ds.map_batches(tag, batch_format="pyarrow", batch_size=4096)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = a.astype(np.uint64) ^ b.astype(np.uint64)
    cnt = np.zeros(x.shape, dtype=np.int64)
    for _ in range(64):
        cnt += (x & _U(1)).astype(np.int64)
        x >>= _U(1)
    return cnt


def simhash_near_dup_pairs(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> pa.Table:
    """Near-dup pairs by SimHash: 4 x 16-bit band buckets guarantee any
    pair within Hamming distance 3 shares >= 1 band (pigeonhole), then
    exact Hamming verification per bucket."""
    with_sig = add_simhash(ds.select_columns([id_col, text_col]), text_col)

    def to_bands(batch: pa.Table) -> pa.Table:
        sig = batch["simhash"].to_numpy().astype(np.uint64)
        ids = batch[id_col].to_numpy()
        t = {"band_id": [], "band_val": [], "doc_id": [], "simhash": []}
        for bnd in range(4):
            t["band_id"].append(np.full(len(ids), bnd, dtype=np.int64))
            t["band_val"].append(
                ((sig >> _U(16 * bnd)) & _U(0xFFFF)).astype(np.int64)
            )
            t["doc_id"].append(ids)
            t["simhash"].append(sig.astype(np.int64))
        return pa.table({k: np.concatenate(v) for k, v in t.items()})

    bands = with_sig.map_batches(to_bands, batch_format="pyarrow")

    def add_key(batch: pa.Table) -> pa.Table:
        key = hash_combine(
            batch["band_id"].to_numpy().astype(np.uint64),
            batch["band_val"].to_numpy().astype(np.uint64),
        ).astype(np.int64)
        return pa.table(
            {
                "bucket": key,
                "doc_id": batch["doc_id"],
                "simhash": batch["simhash"],
            }
        )

    sorted_bands = bands.map_batches(add_key, batch_format="pyarrow").sort(
        "bucket"
    )

    # Sort-based bucket pairing (see minhash_lsh_candidates): all-pairs
    # verification needs full bucket contents, so runs that touch a
    # block BOUNDARY are forwarded as member rows and paired on the
    # driver (boundary runs are O(#blocks) buckets — tiny).
    def emit(batch: pa.Table) -> pa.Table:
        k = batch["bucket"].to_numpy()
        d = batch["doc_id"].to_numpy()
        s = batch["simhash"].to_numpy().astype(np.uint64)
        order = np.lexsort((d, k))
        k, d, s = k[order], d[order], s[order]
        new = np.concatenate([[True], k[1:] != k[:-1]])
        starts = np.flatnonzero(new)
        ends = np.concatenate([starts[1:], [len(k)]])
        out_a, out_b, out_h = [], [], []
        bnd_d, bnd_s, bnd_k = [], [], []
        # loop ONLY over multi-member or boundary runs (singleton
        # interior runs — the vast majority — are skipped wholesale)
        interesting = np.flatnonzero(
            ((ends - starts) >= 2) | (starts == 0) | (ends == len(k))
        )
        for ri in interesting:
            st, en = starts[ri], ends[ri]
            boundary = st == 0 or en == len(k)
            if boundary:
                bnd_d.append(d[st:en])
                bnd_s.append(s[st:en])
                bnd_k.append(k[st:en])
                continue
            m = en - st
            if m < 2:
                continue
            ii, jj = np.triu_indices(m, k=1)
            hd = hamming64(s[st:en][ii], s[st:en][jj])
            ok = hd <= max_hamming
            out_a.append(d[st:en][ii[ok]])
            out_b.append(d[st:en][jj[ok]])
            out_h.append(hd[ok])
        pa_a = np.concatenate(out_a) if out_a else np.empty(0, dtype=d.dtype)
        pa_b = np.concatenate(out_b) if out_b else np.empty(0, dtype=d.dtype)
        pa_h = (
            np.concatenate(out_h) if out_h else np.empty(0, dtype=np.int64)
        )
        bd = np.concatenate(bnd_d) if bnd_d else np.empty(0, dtype=d.dtype)
        bs = (
            np.concatenate(bnd_s).astype(np.int64)
            if bnd_s
            else np.empty(0, dtype=np.int64)
        )
        bk = np.concatenate(bnd_k) if bnd_k else np.empty(0, dtype=np.int64)
        return pa.table(
            {
                "doc_a": np.concatenate([pa_a, bd]),
                "doc_b": np.concatenate([pa_b, bd]),
                "hamming": np.concatenate(
                    [pa_h, np.full(len(bd), -1, dtype=np.int64)]
                ),
                "bucket": np.concatenate(
                    [np.zeros(len(pa_a), dtype=np.int64), bk]
                ),
                "sig": np.concatenate(
                    [np.zeros(len(pa_a), dtype=np.int64), bs]
                ),
            }
        )

    both = sorted_bands.map_batches(emit, batch_format="pyarrow").to_pandas()
    pairs = both[both["hamming"] >= 0][["doc_a", "doc_b", "hamming"]]
    bnd = both[both["hamming"] < 0]
    extra = []
    for _bucket, g in bnd.groupby("bucket"):
        g = g.drop_duplicates(subset=["doc_a"]).sort_values("doc_a")
        ids = g["doc_a"].to_numpy()
        sg = g["sig"].to_numpy().astype(np.uint64)
        if len(ids) < 2:
            continue
        ii, jj = np.triu_indices(len(ids), k=1)
        hd = hamming64(sg[ii], sg[jj])
        ok = hd <= max_hamming
        extra.append(
            pd.DataFrame(
                {"doc_a": ids[ii[ok]], "doc_b": ids[jj[ok]], "hamming": hd[ok]}
            )
        )
    if extra:
        pairs = pd.concat([pairs] + extra, ignore_index=True)
    pdf = pairs.drop_duplicates(subset=["doc_a", "doc_b"])
    return pa.Table.from_pandas(
        pdf.sort_values(["doc_a", "doc_b"]).reset_index(drop=True),
        preserve_index=False,
    )


def ngram_jaccard_pairs(
    ds: ray.data.Dataset,
    block_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    shingle_k: int = 3,
) -> ray.data.Dataset:
    """All-pairs n-gram Jaccard within a blocking key (e.g. lang or an
    LSH bucket) — the verify-everything variant for modest blocks."""

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy()
        texts = g[text_col].to_numpy()
        sets = [set(word_shingles(t.split(" "), shingle_k)) for t in texts]
        rows_a, rows_b, sims = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                inter = len(sets[i] & sets[j])
                if inter == 0:
                    continue
                sim = inter / len(sets[i] | sets[j])
                if sim >= threshold:
                    rows_a.append(ids[i])
                    rows_b.append(ids[j])
                    sims.append(sim)
        return pd.DataFrame(
            {
                "doc_a": pd.Series(rows_a, dtype=ids.dtype),
                "doc_b": pd.Series(rows_b, dtype=ids.dtype),
                "jaccard": pd.Series(sims, dtype="float64"),
            }
        )

    return ds.select_columns([id_col, text_col, block_col]).groupby(
        block_col
    ).map_groups(emit, batch_format="pandas")
