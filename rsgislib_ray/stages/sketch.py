"""Mergeable sketches over Dataset columns.

KMV (k-minimum-values) distinct-count sketch: per batch keep the k
smallest splitmix64 hash values of the key column; the union of
per-batch sketches is itself a KMV sketch (order-insensitive,
mergeable — the property that makes it shuffle-free: each block
contributes <= k values and the driver merges blocks x k values, never
rows). Estimator: exact |union| when fewer than k distinct hashes were
seen, else (k-1) * 2^64 / h_k (Beyer et al. 2007, "On Synopses for
Distinct-Value Estimation under Multiset Operations").

The reference has no sketches (its count-distinct paths are exact
RAT histograms, rastergis.cpp); this is a training-data-pipeline
extension, deterministic and ORACLE-CHECKED: splitmix64 is mirrored
bit-exactly in DuckDB HUGEINT arithmetic (see the query's SQL), so the
ESTIMATE itself — not just its error bound — is verified.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from rsgislib_ray.functions.hashing import splitmix64

TWO64 = 18446744073709551616.0


def kmv_distinct_count(
    ds: ray.data.Dataset, key_col: str, k: int = 1024
) -> pa.Table:
    """Approximate distinct count of an integer key column. Returns one
    row: (distinct_est: double, n_kept: int64, k: int64). Relative
    error ~ 1/sqrt(k-2)."""

    def partial(batch: pa.Table) -> pa.Table:
        h = np.unique(
            splitmix64(batch[key_col].to_numpy().astype(np.uint64))
        )
        return pa.table({"h": h[:k].astype(np.int64)})  # k smallest (sorted)

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    # merge: blocks x k values max — tiny, order-insensitive
    merged = np.unique(
        parts.to_pandas()["h"].to_numpy().astype(np.uint64)
    )
    kept = merged[:k]
    if len(merged) < k:
        est = float(len(merged))
    else:
        hk = float(kept[k - 1])
        est = (float(k) - 1.0) * TWO64 / hk
    return pa.table(
        {
            "distinct_est": pa.array([est], pa.float64()),
            "n_kept": pa.array([len(kept)], pa.int64()),
            "k": pa.array([k], pa.int64()),
        }
    )


HLL_P = 12
HLL_M = 1 << HLL_P
_W_BITS = 64 - HLL_P          # 52
_RHO_MAX = _W_BITS + 1        # 53
_POW_W = float(1 << _W_BITS)  # 2^52 exactly


def hll_distinct_count(
    ds: ray.data.Dataset, key_col: str
) -> pa.Table:
    """HyperLogLog distinct count (Flajolet et al. 2007), p=12
    (m=4096 registers, ~1.6% relative error). Registers are the max
    leading-zero rank per bucket — a mergeable max-sketch, so each
    block ships at most m (register, rho) rows and merging is a max.

    ORACLE-EXACT by construction: rho is integer (bit length), the
    harmonic sum is accumulated as the EXACT integer
    S = sum_r 2^(RHO_MAX - M_r) (Python bigint here, HUGEINT in SQL),
    and the float estimate is one identical expression on both sides —
    no float summation order anywhere."""

    def partial(batch: pa.Table) -> pa.Table:
        h = splitmix64(batch[key_col].to_numpy().astype(np.uint64))
        reg = (h >> np.uint64(_W_BITS)).astype(np.int64)
        w = h & np.uint64((1 << _W_BITS) - 1)
        # rho = RHO_MAX - bit_length(w); vectorized bit length via log2
        # is float-unsafe, use the exact integer path
        bl = np.zeros(len(w), dtype=np.int64)
        nz = w > 0
        # bit_length via frexp on exact doubles is unsafe >2^53; do it
        # with a 6-step binary reduction (exact, vectorized)
        ww = w[nz].copy()
        for shift in (32, 16, 8, 4, 2, 1):
            big = ww >= (np.uint64(1) << np.uint64(shift))
            bl[np.flatnonzero(nz)[big]] += shift
            ww = np.where(big, ww >> np.uint64(shift), ww)
        bl[nz] += 1  # bit_length = floor(log2)+1
        rho = np.where(nz, _RHO_MAX - bl, _RHO_MAX).astype(np.int64)
        regs = np.zeros(HLL_M, dtype=np.int64)
        np.maximum.at(regs, reg, rho)
        hit = np.flatnonzero(regs)
        return pa.table({"reg": hit, "rho": regs[hit]})

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    pdf = parts.to_pandas()  # bounded: blocks x m rows
    regs = np.zeros(HLL_M, dtype=np.int64)
    np.maximum.at(regs, pdf["reg"].to_numpy(), pdf["rho"].to_numpy())
    S = sum(1 << (_RHO_MAX - int(mr)) for mr in regs)  # exact bigint
    v_zero = int((regs == 0).sum())
    alpha = 0.7213 / (1.0 + 1.079 / float(HLL_M))
    est = (
        alpha * float(HLL_M) * float(HLL_M)
        * (2.0 * _POW_W) / float(S)
    )
    if est <= 2.5 * float(HLL_M) and v_zero > 0:
        import math

        est = float(HLL_M) * math.log(float(HLL_M) / float(v_zero))
    return pa.table(
        {
            "distinct_est": pa.array([est], pa.float64()),
            "v_zero": pa.array([v_zero], pa.int64()),
            "m": pa.array([HLL_M], pa.int64()),
        }
    )


CMS_D = 4       # hash rows
CMS_W = 2048    # counters per row


def cms_estimate_counts(
    ds: ray.data.Dataset,
    key_col: str,
    query_keys: np.ndarray,
) -> pa.Table:
    """Count-min sketch (Cormode & Muthukrishnan 2005) frequency
    estimates for ``query_keys``: d x w integer counter matrix built as
    per-batch bincounts and SUMMED (mergeable — each block ships one
    d*w partial, never rows); estimate = min over rows. All-integer, so
    the estimate is exactly reproducible (and SQL-mirrorable: row i
    counter = COUNT(*) GROUP BY splitmix64(key ^ seed_i) % w)."""

    def row_hash(keys: np.ndarray, i: int) -> np.ndarray:
        # distinct-input family (see _bloom_slots): k*8+i never
        # collides across (k, i), keeping the d rows independent
        with np.errstate(over="ignore"):
            x = keys.astype(np.uint64) * np.uint64(8) + np.uint64(4 + i)
        return (splitmix64(x) % np.uint64(CMS_W)).astype(np.int64)

    def partial(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy().astype(np.int64)
        counters = np.zeros(CMS_D * CMS_W, dtype=np.int64)
        for i in range(CMS_D):
            counters[i * CMS_W : (i + 1) * CMS_W] = np.bincount(
                row_hash(k, i), minlength=CMS_W
            )
        hit = np.flatnonzero(counters)
        return pa.table({"slot": hit, "n": counters[hit]})

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    pdf = parts.to_pandas()  # bounded: blocks x d*w rows
    counters = np.zeros(CMS_D * CMS_W, dtype=np.int64)
    np.add.at(counters, pdf["slot"].to_numpy(), pdf["n"].to_numpy())
    q = np.asarray(query_keys, dtype=np.int64)
    ests = np.full(len(q), np.iinfo(np.int64).max)
    for i in range(CMS_D):
        ests = np.minimum(ests, counters[i * CMS_W + row_hash(q, i)])
    return pa.table(
        {
            "key": pa.array(q, pa.int64()),
            "est_count": pa.array(ests, pa.int64()),
        }
    )


BLOOM_BITS = 1 << 17  # 131072
BLOOM_D = 4


def _bloom_slots(keys: np.ndarray, i: int) -> np.ndarray:
    # hash INPUTS must be distinct across the whole (key, i) grid:
    # xor-with-consecutive-constants collapses for dense integer keys
    # (k ^ (C+1) == (k^delta) ^ C), correlating the probes 7x above
    # the independent rate — measured before this fix. k*8+i never
    # collides across (k, i).
    with np.errstate(over="ignore"):
        x = keys.astype(np.uint64) * np.uint64(8) + np.uint64(i)
    return (splitmix64(x) % np.uint64(BLOOM_BITS)).astype(np.int64)


def bloom_filter_semi_join(
    big: ray.data.Dataset,
    member_keys: np.ndarray,
    key_col: str,
) -> ray.data.Dataset:
    """Bloom-filter pre-join: keep rows of ``big`` whose key MIGHT be
    in ``member_keys`` (no false negatives; deterministic false
    positives ~ (1-e^(-dn/m))^d). The filter is a mergeable OR-bitmap —
    the standard way to pre-filter a huge probe stream before an exact
    join without broadcasting the exact key set. The pass set is fully
    deterministic, so it is ORACLE-CHECKABLE (the SQL mirrors the
    splitmix64 slot positions)."""
    bits = np.zeros(BLOOM_BITS, dtype=bool)
    mk = np.asarray(member_keys, dtype=np.int64)
    for i in range(BLOOM_D):
        bits[_bloom_slots(mk, i)] = True
    ref = ray.put(np.packbits(bits))

    def probe(batch: pa.Table) -> pa.Table:
        from rsgislib_ray.state.broadcast import cached

        packed = cached(ref)
        b = np.unpackbits(packed).astype(bool)
        k = batch[key_col].to_numpy().astype(np.int64)
        ok = np.ones(len(k), dtype=bool)
        for i in range(BLOOM_D):
            ok &= b[_bloom_slots(k, i)]
        return batch.filter(pa.array(ok))

    return big.map_batches(probe, batch_format="pyarrow")
