"""Checkpoint/resume semantics + partition-count determinism."""

import glob
import os

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from rsgislib_ray.runtime.checkpoint import (
    checkpointed_write,
    finished_partitions,
    lineage_fingerprint,
    read_checkpointed,
    resume_filter,
)


def _pts(n=500) -> ray.data.Dataset:
    rng = np.random.default_rng(42)
    return ray.data.from_arrow(
        pa.table(
            {
                "id": np.arange(n, dtype=np.int64),
                "x": rng.uniform(0, 100, n),
                "y": rng.uniform(0, 100, n),
                "part": (np.arange(n, dtype=np.int64) % 7),
            }
        )
    ).repartition(4)


LINEAGE = [{"op": "test_write", "params": {"v": 1}}]


def test_checkpointed_write_and_read_roundtrip(ray_session, tmp_path):
    out = str(tmp_path / "out")
    meta = checkpointed_write(_pts(), out, "part", LINEAGE)
    assert meta["partitions_written"] == 7
    assert meta["rows_written"] == 500
    lid = lineage_fingerprint(LINEAGE)
    assert finished_partitions(out, lid) == set(range(7))
    back = read_checkpointed(out).to_pandas().sort_values("id")
    assert len(back) == 500
    np.testing.assert_array_equal(
        back["id"].to_numpy(), np.arange(500, dtype=np.int64)
    )


def test_resume_skips_finished_partitions(ray_session, tmp_path):
    out = str(tmp_path / "out")
    ds = _pts()
    # first run: only partitions 0-2 committed (simulate a crash by
    # writing a filtered subset)
    first = ds.map_batches(
        lambda t: t.filter(pa.compute.less(t["part"], 3)),
        batch_format="pyarrow",
    )
    checkpointed_write(first, out, "part", LINEAGE)
    lid = lineage_fingerprint(LINEAGE)
    assert finished_partitions(out, lid) == {0, 1, 2}

    # resume: input pruned to unfinished partitions only
    pruned, done = resume_filter(
        ds, out, "part", lambda b: b["part"].to_numpy(), LINEAGE
    )
    assert done == {0, 1, 2}
    remaining = pruned.to_pandas()
    assert set(remaining["part"]) == {3, 4, 5, 6}
    checkpointed_write(pruned, out, "part", LINEAGE, skip_partitions=done)
    # final state == single clean run
    back = read_checkpointed(out).to_pandas()
    assert len(back) == 500


def test_different_lineage_not_reused(ray_session, tmp_path):
    out = str(tmp_path / "out")
    checkpointed_write(_pts(), out, "part", LINEAGE)
    other = [{"op": "test_write", "params": {"v": 2}}]
    assert finished_partitions(out, lineage_fingerprint(other)) == set()


def test_atomic_layout(ray_session, tmp_path):
    out = str(tmp_path / "out")
    checkpointed_write(_pts(), out, "part", LINEAGE)
    # no tmp dirs left behind; one dir per partition
    assert not glob.glob(os.path.join(out, "*.tmp-*"))
    assert len(glob.glob(os.path.join(out, "part=*"))) == 7
    assert os.path.exists(os.path.join(out, "_LINEAGE.json"))
