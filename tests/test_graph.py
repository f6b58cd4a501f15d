"""PageRank (stages/graph.py): partition independence of the
integer-exact iteration and equality with a naive single-machine
reference implementation."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from rsgislib_ray.stages.graph import pagerank


def _naive_pagerank(edges, nodes, outdeg, iters=3):
    pr = {int(n): 1_000_000 for n in nodes}
    for _ in range(iters):
        nxt = {int(n): 150_000 for n in nodes}
        for u, v in edges:
            nxt[int(v)] += (pr[int(u)] * 85) // (100 * outdeg)
        pr = nxt
    return pr


@pytest.mark.parametrize("blocks", [1, 3, 7])
def test_pagerank_partition_independent(ray_session, blocks):
    rng = np.random.default_rng(11)
    nodes = np.arange(40, dtype=np.int64) * 3
    # constant out-degree 2: each node points at two pseudorandom others
    u = np.repeat(nodes, 2)
    v = nodes[
        (np.arange(80) * 7 + rng.integers(0, 40, size=80)) % 40
    ]
    edges_tbl = pa.table({"u": u, "v": v})
    expected = _naive_pagerank(list(zip(u.tolist(), v.tolist())), nodes, 2)

    ds = ray.data.from_arrow(edges_tbl).repartition(blocks)
    out = pagerank(ds, nodes, outdeg=2, iters=3)
    got = dict(zip(out["node"].to_numpy(), out["pr"].to_numpy()))
    assert got == expected


def test_pagerank_mass_bounds(ray_session):
    """Ranks stay positive and the floor-division loss keeps total mass
    at or below the closed-form budget."""
    nodes = np.arange(30, dtype=np.int64)
    u = nodes
    v = (nodes + 1) % 30  # ring, outdeg 1
    ds = ray.data.from_arrow(pa.table({"u": u, "v": v}))
    out = pagerank(ds, nodes, outdeg=1, iters=3)
    pr = out["pr"].to_numpy()
    assert (pr > 0).all()
    # ring with outdeg 1 is symmetric: every node identical
    assert len(np.unique(pr)) == 1
