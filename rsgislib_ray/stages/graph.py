"""Graph iteration over Ray Data — PageRank on a kNN neighbor graph.

The reference's RAT-kNN machinery (apply_rat_knn / calc_fill_regions_knn)
builds neighbor relations between features; this module runs an
iterative graph algorithm over that relation — the canonical
"iterate until converged over an edge list" shape a distributed engine
must support (same pattern as label propagation or iterative focal
ops).

Determinism: ranks are kept in exact int64 micro-units with floor
division (share = pr * 85 // (100 * outdeg)), so the per-iteration
sums are associative and order-independent under any parallelism, and
a SQL oracle can unroll the iterations bit-exactly.

Scale shape: the per-node rank vector is broadcast state (ray.put once
per iteration, read per worker); edge batches stream through
map_batches producing per-target partial sums, finished by ONE narrow
groupby per iteration. This is the broadcast-state regime (node count
<< edge count, the usual kNN-graph case). For graphs whose node state
exceeds worker memory, swap the broadcast for a hash-partitioned
join of (edges ⋈ ranks) on u — the partial/groupby stages are
unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def knn_edges(
    points: ray.data.Dataset,
    points_tbl: pa.Table,
    k: int = 4,
    id_col: str = "base_id",
) -> ray.data.Dataset:
    """Directed kNN edge list u -> v: each node's ``k`` nearest OTHER
    nodes ordered by (squared distance, id) — self-pairs excluded after
    an (k+1)-NN query, keeping the first k survivors per node."""
    from rsgislib_ray.stages.knn import knn_join

    nn = knn_join(
        points,
        points_tbl,
        k=k + 1,
        id_col=id_col,
        tie="lowest",
        prefix="nn_",
    )

    def to_edges(batch: pa.Table) -> pa.Table:
        u = batch[id_col].to_numpy()
        v = batch["nn_id"].to_numpy()
        rank = batch["nn_rank"].to_numpy()
        order = np.lexsort((rank, u))
        u, v = u[order], v[order]
        keep = u != v
        u, v = u[keep], v[keep]
        # after dropping self, keep the first k rows of each u-run
        newrun = np.concatenate([[True], u[1:] != u[:-1]])
        starts = np.flatnonzero(newrun)
        lens = np.diff(np.concatenate([starts, [len(u)]]))
        within = np.arange(len(u)) - np.repeat(starts, lens)
        sel = within < k
        return pa.table({"u": pa.array(u[sel]), "v": pa.array(v[sel])})

    return nn.map_batches(to_edges, batch_format="pyarrow")


def pagerank(
    edges: ray.data.Dataset,
    node_ids: np.ndarray,
    outdeg: int,
    iters: int = 3,
    damping_pct: int = 85,
    unit: int = 1_000_000,
) -> pa.Table:
    """Integer-exact PageRank over a constant-out-degree edge list.

    pr_0 = unit; pr_{t+1}(v) = (100 - damping_pct)% of unit +
    sum over in-edges of ``pr_t(u) * damping_pct // (100 * outdeg)``
    (floor division — exact, associative). Returns (node, pr)."""
    nids = np.sort(np.asarray(node_ids, dtype=np.int64))
    pr = np.full(len(nids), unit, dtype=np.int64)
    base = (100 - damping_pct) * unit // 100
    edges = edges.materialize()

    for _ in range(iters):
        pr_ref = ray.put((nids, pr))

        def partial(batch: pa.Table, _ref=pr_ref) -> pa.Table:
            from rsgislib_ray.state.broadcast import cached

            cn, cp = cached(_ref)
            u = batch["u"].to_numpy()
            v = batch["v"].to_numpy()
            share = (cp[np.searchsorted(cn, u)] * damping_pct) // (
                100 * outdeg
            )
            g = (
                pd.DataFrame({"v": v, "share": share})
                .groupby("v", as_index=False)["share"]
                .sum()
            )
            return pa.table(
                {
                    "v": g["v"].to_numpy(),
                    "share": g["share"].to_numpy().astype(np.int64),
                }
            )

        partials = edges.map_batches(partial, batch_format="pyarrow")
        # combine the contracted partials (<= blocks x nodes rows, the
        # same size class as the broadcast rank vector itself) with one
        # exact-integer pandas groupby — a Ray sort-shuffle's fixed cost
        # dominates at per-node sizes; swap for groupby("v").sum when
        # node state outgrows the broadcast regime (module docstring)
        t = pa.concat_tables(
            [
                b
                for b in (ray.get(r) for r in partials.to_arrow_refs())
                if b.num_rows
            ]
        )
        new_pr = np.full(len(nids), base, dtype=np.int64)
        if t.num_rows:
            g = (
                t.to_pandas()
                .groupby("v", as_index=False)["share"]
                .sum()
            )
            pos = np.searchsorted(nids, g["v"].to_numpy())
            new_pr[pos] += g["share"].to_numpy().astype(np.int64)
        pr = new_pr

    return pa.table({"node": pa.array(nids), "pr": pa.array(pr)})
