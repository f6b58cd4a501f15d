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
