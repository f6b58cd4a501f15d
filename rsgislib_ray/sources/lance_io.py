"""Lance-style table adapter over parquet fragments + a JSON manifest.

The north rule names Lance tables as the storage substrate; ``pylance``
is not installable in this sandbox, so this adapter speaks a
Lance-shaped layout — immutable fragment files + a versioned manifest
listing them — with parquet as the default physical driver. Swapping in
real Lance later only changes ``_read_fragment_paths`` /
``write_fragments`` internals; every caller sees ``ray.data.Dataset``.

Layout of a table directory::

    <uri>/
      _manifests/v{N}.json   # {"version": N, "fragments": [{"id", "path",
                             #   "rows", "schema_names"}], "lineage": [...]}
      data/frag-{id:05d}-{uuid}.parquet

Writes are resumable/atomic: fragments land under ``data/`` with
content-addressed names, then one manifest write commits them (the
rename-commit idiom; a crashed writer leaves dangling fragments that no
manifest references). This is the engine-level analog of the
reference's file+JSON-manifest staging between tiled-pipeline stages
(/root/reference/python/rsgislib/segmentation/tiledsegsingle.py:543-706).
"""

from __future__ import annotations

import json
import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data


def _manifest_dir(uri: str) -> str:
    return os.path.join(uri, "_manifests")


def latest_version(uri: str) -> int | None:
    mdir = _manifest_dir(uri)
    if not os.path.isdir(mdir):
        return None
    versions = [
        int(f[1:-5])
        for f in os.listdir(mdir)
        if f.startswith("v") and f.endswith(".json")
    ]
    return max(versions) if versions else None


def read_manifest(uri: str, version: int | None = None) -> dict:
    if version is None:
        version = latest_version(uri)
    if version is None:
        raise FileNotFoundError(f"no manifest under {uri}")
    with open(os.path.join(_manifest_dir(uri), f"v{version}.json")) as f:
        return json.load(f)


def read_table(
    uri: str,
    columns: list[str] | None = None,
    version: int | None = None,
    **read_kwargs,
) -> ray.data.Dataset:
    """Open a Lance-style table as a streaming Dataset (column-pruned
    parquet read of exactly the fragments the manifest commits)."""
    man = read_manifest(uri, version)
    paths = [os.path.join(uri, fr["path"]) for fr in man["fragments"]]
    return ray.data.read_parquet(paths, columns=columns, **read_kwargs)


def write_fragments(
    ds: ray.data.Dataset,
    uri: str,
    lineage: list[dict] | None = None,
) -> dict:
    """Write a Dataset as a new table version.

    Each Ray block becomes one fragment file (streamed out via
    ``iter_internal_ref_bundles`` would pin; instead we use Ray Data's
    own parallel ``write_parquet`` into a staging dir, then commit the
    produced files in one manifest). Returns the manifest dict.
    """
    os.makedirs(os.path.join(uri, "data"), exist_ok=True)
    os.makedirs(_manifest_dir(uri), exist_ok=True)
    stage = os.path.join(uri, "data", f"_stage-{uuid.uuid4().hex[:12]}")
    ds.write_parquet(stage)
    frags = []
    for i, name in enumerate(sorted(os.listdir(stage))):
        src = os.path.join(stage, name)
        final = f"frag-{i:05d}-{uuid.uuid4().hex[:8]}.parquet"
        dst = os.path.join(uri, "data", final)
        os.rename(src, dst)
        frags.append(
            {
                "id": i,
                "path": os.path.join("data", final),
                "rows": pq.read_metadata(dst).num_rows,
            }
        )
    os.rmdir(stage)
    prev = latest_version(uri)
    version = 1 if prev is None else prev + 1
    manifest = {
        "version": version,
        "fragments": frags,
        "lineage": lineage or [],
    }
    tmp = os.path.join(_manifest_dir(uri), f".v{version}.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.rename(tmp, os.path.join(_manifest_dir(uri), f"v{version}.json"))
    return manifest


def write_table_arrow(table: pa.Table, uri: str) -> dict:
    """Driver-side write of a small Arrow table as a one-fragment
    version (fixtures, zone side-tables)."""
    os.makedirs(os.path.join(uri, "data"), exist_ok=True)
    os.makedirs(_manifest_dir(uri), exist_ok=True)
    name = f"frag-00000-{uuid.uuid4().hex[:8]}.parquet"
    pq.write_table(table, os.path.join(uri, "data", name))
    prev = latest_version(uri)
    version = 1 if prev is None else prev + 1
    manifest = {
        "version": version,
        "fragments": [
            {"id": 0, "path": os.path.join("data", name), "rows": table.num_rows}
        ],
        "lineage": [],
    }
    tmp = os.path.join(_manifest_dir(uri), f".v{version}.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.rename(tmp, os.path.join(_manifest_dir(uri), f"v{version}.json"))
    return manifest
