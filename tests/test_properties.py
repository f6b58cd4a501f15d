"""Hypothesis property tests: partition-layout independence of the
core distributed reducers (the repo's central invariant — any block
layout must produce identical results)."""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings, strategies as st


@settings(max_examples=6, deadline=None)
@given(
    n=st.integers(10, 400),
    blocks=st.integers(1, 12),
    seed=st.integers(0, 2**16),
)
def test_segment_sum_partition_independent(ray_session, n, blocks, seed):
    import ray

    from rsgislib_ray.stages.segsum import segment_sum

    rng = np.random.default_rng(seed)
    t = pa.table(
        {
            "key": rng.integers(0, max(n // 3, 1), n),
            "v": rng.integers(-1000, 1000, n),
        }
    )
    got = (
        segment_sum(ray.data.from_arrow(t).repartition(blocks), "key", ["v"])
        .to_pandas()
        .sort_values("key")
        .reset_index(drop=True)
    )
    want = (
        t.to_pandas().groupby("key", as_index=False)["v"].sum()
        .sort_values("key")
        .reset_index(drop=True)
    )
    assert got["key"].tolist() == want["key"].tolist()
    assert got["v"].tolist() == want["v"].tolist()


@settings(max_examples=5, deadline=None)
@given(
    n_lines=st.integers(1, 25),
    blocks=st.integers(1, 8),
    seed=st.integers(0, 2**16),
)
def test_points_along_lines_partition_independent(
    ray_session, n_lines, blocks, seed
):
    import ray

    from rsgislib_ray.stages.lines import points_along_lines

    rng = np.random.default_rng(seed)
    rows = []
    for lid in range(1, n_lines + 1):
        for s in range(1, int(rng.integers(1, 6)) + 1):
            rows.append(
                (
                    lid,
                    s,
                    int(rng.integers(0, 10000)) / 100.0 + 0.005,
                    int(rng.integers(0, 10000)) / 100.0 + 0.005,
                )
            )
    tbl = pa.Table.from_pandas(
        pd.DataFrame(rows, columns=["line_id", "seq", "x", "y"]),
        preserve_index=False,
    )
    outs = []
    for b in (1, blocks):
        outs.append(
            points_along_lines(
                ray.data.from_arrow(tbl).repartition(b), pt_step=15.0
            )
            .to_pandas()
            .sort_values(["line_id", "pt_id"])
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])


@settings(max_examples=5, deadline=None)
@given(blocks=st.integers(1, 10), seed=st.integers(0, 2**16))
def test_exact_dedup_partition_independent(ray_session, blocks, seed):
    import ray

    from rsgislib_ray.stages.dedup import exact_dedup

    rng = np.random.default_rng(seed)
    n = 300
    t = pa.table(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": pa.array(
                [f"doc-{int(v)}" for v in rng.integers(0, 60, n)],
                pa.string(),
            ),
        }
    )
    outs = []
    for b in (1, blocks):
        got = (
            exact_dedup(
                ray.data.from_arrow(t).repartition(b), ["text"], "doc_id"
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        outs.append(got)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    # first-wins: every surviving id is the min id of its text group
    df = t.to_pandas()
    winners = df.groupby("text")["doc_id"].min().sort_values().tolist()
    assert outs[0]["doc_id"].tolist() == winners
