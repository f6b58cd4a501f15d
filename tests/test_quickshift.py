"""Quickshift (stages/quickshift.py): scalar brute-force parity,
partition independence, and the oracle round guard."""

import numpy as np
import pyarrow as pa
import ray.data

from rsgislib_ray.stages.quickshift import (
    CS,
    SCALE,
    quickshift_segments,
)


def _brute(v):
    h, w = v.shape
    pid = np.arange(h * w).reshape(h, w)
    dens = np.zeros((h, w), np.int64)
    offs = [
        (dr, dc)
        for dr in range(-2, 3)
        for dc in range(-2, 3)
        if (dr, dc) != (0, 0)
    ]
    for r in range(h):
        for c in range(w):
            for dr, dc in offs:
                rr, cc = r + dr, c + dc
                if 0 <= rr < h and 0 <= cc < w:
                    d2 = CS * (dr * dr + dc * dc) + int(
                        v[r, c] - v[rr, cc]
                    ) ** 2
                    dens[r, c] += SCALE // (1 + d2)
    parent = pid.copy()
    for r in range(h):
        for c in range(w):
            best = None
            for dr, dc in offs:
                rr, cc = r + dr, c + dc
                if 0 <= rr < h and 0 <= cc < w and dens[rr, cc] > dens[r, c]:
                    d2 = CS * (dr * dr + dc * dc) + int(
                        v[r, c] - v[rr, cc]
                    ) ** 2
                    k = (d2, pid[rr, cc])
                    if best is None or k < best:
                        best = k
                        parent[r, c] = pid[rr, cc]
    # min-id labels per tree (union-find)
    root = {}

    def find(x):
        while root.get(x, x) != x:
            x = root[x]
        return x

    for p, q in zip(pid.ravel(), parent.ravel()):
        a, b = find(int(p)), find(int(q))
        if a != b:
            root[max(a, b)] = min(a, b)
    lbl = np.array([find(int(p)) for p in pid.ravel()])
    return dens.ravel(), parent.ravel(), lbl


def _run(v, tile_size):
    h, w = v.shape
    pid = np.arange(h * w, dtype=np.int64)
    r, c = np.divmod(pid, w)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "pixel_id": pid, "row": r, "col": c,
                "value": v.ravel().astype(np.int64),
            }
        )
    ).repartition(4)
    return (
        quickshift_segments(ds, tile_size=tile_size)
        .sort("pixel_id")
        .take_all()
    )


def test_quickshift_brute_parity_and_tiles(ray_session):
    rng = np.random.RandomState(8)
    v = rng.randint(0, 25, size=(18, 18)).astype(np.int64)
    dens, parent, lbl = _brute(v)
    out = _run(v, tile_size=7)
    assert len(out) == 18 * 18
    for row in out:
        p = row["pixel_id"]
        assert row["dens"] == dens[p]
        assert row["parent"] == parent[p]
        assert row["seg_label"] == lbl[p]
    # partition independence
    out2 = _run(v, tile_size=18)
    assert out == out2
    # multiple modes exist
    assert len({r["seg_label"] for r in out}) >= 2


def test_oracle_round_guard(ray_session):
    """min-label Jacobi rounds on the contract fixture < _QS_K."""
    from rsgislib_ray.pipelines.queries import _FILL_N, _QS_K

    pid = np.arange(_FILL_N * _FILL_N, dtype=np.int64)
    r, c = np.divmod(pid, _FILL_N)
    v = (
        (r * 31 + c * 17) % 23
        + ((r - 20) * (r - 20) + (c - 20) * (c - 20)) // 40
    ).reshape(_FILL_N, _FILL_N)
    dens, parent, _ = _brute(v)
    # undirected adjacency from the parent forest
    n = len(pid)
    adj = [[] for _ in range(n)]
    for p, q in zip(pid, parent):
        if p != q:
            adj[p].append(q)
            adj[q].append(p)
    lbl = pid.copy()
    rounds = 0
    while True:
        new = lbl.copy()
        for p in range(n):
            for q in adj[p]:
                if lbl[q] < new[p]:
                    new[p] = lbl[q]
        rounds += 1
        if np.array_equal(new, lbl):
            break
        lbl = new
    assert rounds < _QS_K, rounds
