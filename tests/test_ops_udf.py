"""User-extension protocol (SURVEY §2.11): BatchOp + Aggregator."""

import numpy as np
import pyarrow as pa
import ray.data

from rsgislib_ray.ops import OpContext, apply_aggregator, apply_op


def test_batch_op_with_broadcast_state(ray_session):
    """A user op reading broadcast side-state through ctx.state —
    the RSGISCalcImageValue-visitor shape."""
    ds = ray.data.range(1000).map_batches(
        lambda b: pa.table({"v": b["id"]}), batch_format="pyarrow"
    )
    lut = np.arange(1000, dtype=np.int64) * 3  # side table

    def times_lut(batch: pa.Table, ctx: OpContext) -> pa.Table:
        table = ctx.state("lut")
        v = batch["v"].to_numpy()
        return batch.append_column("mapped", pa.array(table[v]))

    out = (
        apply_op(ds, times_lut, broadcast={"lut": lut})
        .to_pandas()
        .sort_values("v")
    )
    np.testing.assert_array_equal(
        out["mapped"].to_numpy(), np.arange(1000) * 3
    )


def test_aggregator_protocol_matches_direct(ray_session):
    """A user mean-per-key aggregator through the partial/combine/final
    pipeline equals the direct computation."""
    rng = np.random.default_rng(4)
    key = rng.integers(0, 20, 5000)
    val = rng.integers(0, 1000, 5000)
    ds = ray.data.from_arrow(
        pa.table({"k": key, "v": val})
    ).repartition(8)

    class MeanAgg:
        key_col = "k"
        combine = {"n": "sum", "s": "sum", "mx": "max"}

        def partial(self, batch: pa.Table) -> pa.Table:
            k = batch["k"].to_numpy()
            v = batch["v"].to_numpy()
            order = np.argsort(k, kind="stable")
            k2, v2 = k[order], v[order]
            starts = np.concatenate([[0], np.flatnonzero(np.diff(k2)) + 1])
            return pa.table(
                {
                    "k": k2[starts],
                    "n": np.diff(np.concatenate([starts, [len(k2)]])).astype(
                        np.int64
                    ),
                    "s": np.add.reduceat(v2, starts),
                    "mx": np.maximum.reduceat(v2, starts),
                }
            )

        def final(self, combined: pa.Table) -> pa.Table:
            n = combined["n"].to_numpy().astype(np.float64)
            s = combined["s"].to_numpy().astype(np.float64)
            return pa.table(
                {
                    "k": combined["k"],
                    "mean": s / n,
                    "mx": combined["mx"],
                }
            )

    got = apply_aggregator(ds, MeanAgg()).to_pandas().sort_values("k")
    import pandas as pd

    want = (
        pd.DataFrame({"k": key, "v": val})
        .groupby("k")
        .agg(mean=("v", "mean"), mx=("v", "max"))
        .reset_index()
    )
    np.testing.assert_allclose(got["mean"].to_numpy(), want["mean"].to_numpy())
    np.testing.assert_array_equal(got["mx"].to_numpy(), want["mx"].to_numpy())
