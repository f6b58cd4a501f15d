"""Small-clump elimination vs a literal single-process simulation of the
reference algorithm (RSGISEliminateSmallClumps.cpp:566-880)."""

import math

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from rsgislib_ray.stages.polygonize import clump
from rsgislib_ray.stages.segmentation import (
    clump_adjacency,
    clump_sums,
    eliminate_small_clumps,
    eliminate_singletons,
)


def _sim_eliminate(label_grid, bands, min_clump_size, spec_threshold):
    """Literal reference simulation: per-clump pixel lists, queue in
    ascending label order, pixel-scan 4-neighbours, sweep-start snapshot
    decisions, sequential apply. One sane deviation from the reference's
    UB: a merge into an already-merged target resolves to that target's
    live representative (the C++ writes a freed clump's id there)."""
    grid = label_grid.copy()
    h, w = grid.shape
    nb = bands.shape[2]

    pixels: dict[int, list] = {}
    sums: dict[int, np.ndarray] = {}
    active: dict[int, bool] = {}
    merged_into: dict[int, int] = {}
    for r in range(h):
        for c in range(w):
            lab = int(grid[r, c])
            pixels.setdefault(lab, []).append((r, c))
            sums.setdefault(lab, np.zeros(nb))
            sums[lab] += bands[r, c]
            active[lab] = True

    def live(lab):
        while lab in merged_into:
            lab = merged_into[lab]
        return lab

    for clump_area in range(1, min_clump_size + 1):
        while True:
            queue = [
                lab
                for lab in sorted(active)
                if active[lab] and len(pixels[lab]) <= clump_area
            ]
            init_small = len(queue)
            if init_small == 0:
                break
            merges = []
            for lab in queue:
                if not (active[lab] and len(pixels[lab]) < min_clump_size):
                    continue
                neigh = set()
                for r, c in pixels[lab]:
                    for dr, dc in ((-1, 0), (1, 0), (0, -1), (0, 1)):
                        r2, c2 = r + dr, c + dc
                        if 0 <= r2 < h and 0 <= c2 < w:
                            v = int(grid[r2, c2])
                            if v != lab:
                                neigh.add(v)
                best, best_d = None, None
                my_n = len(pixels[lab])
                my_mean = sums[lab] / my_n
                for nl in sorted(neigh):
                    if len(pixels[nl]) > my_n:
                        d = math.sqrt(
                            float(((my_mean - sums[nl] / len(pixels[nl])) ** 2).sum())
                        )
                        if best is None or d < best_d:
                            best, best_d = nl, d
                if best is not None and best_d < spec_threshold:
                    merges.append((lab, best))
            for src, tgt in merges:
                tgt = live(tgt)
                for r, c in pixels[src]:
                    grid[r, c] = tgt
                    pixels[tgt].append((r, c))
                sums[tgt] += sums[src]
                active[src] = False
                merged_into[src] = tgt
            below = sum(
                1
                for lab in active
                if active[lab] and len(pixels[lab]) <= clump_area
            )
            if below == 0 or below == init_small:
                break
    return grid


def _fixture(n=40, seedmod=37):
    pid = np.arange(n * n, dtype=np.int64)
    row, col = np.divmod(pid, n)
    value = ((row // 4 + col // 4) % 5).astype(np.int64)
    single = ((row * 31 + col * 17) % seedmod) == 0
    value[single] = 7
    band1 = (pid * 37) % 100
    band2 = (pid * 61) % 100
    t = pa.table(
        {
            "pixel_id": pid,
            "row": row,
            "col": col,
            "value": value,
            "band1": band1,
            "band2": band2,
        }
    )
    return t, n


def test_adjacency_matches_brute(ray_session):
    t, n = _fixture(24)
    ds = ray.data.from_arrow(t).repartition(3)
    cl = clump(ds, tile_size=8)
    df = cl.to_pandas()
    grid = np.zeros((n, n), dtype=np.int64)
    grid[df["row"], df["col"]] = df["comp_label"]
    want = set()
    for r in range(n):
        for c in range(n):
            for dr, dc in ((0, 1), (1, 0)):
                if r + dr < n and c + dc < n:
                    a, b = grid[r, c], grid[r + dr, c + dc]
                    if a != b:
                        want.add((min(a, b), max(a, b)))
    ea, eb = clump_adjacency(cl, tile_size=8)
    got = set(zip(ea.tolist(), eb.tolist()))
    assert got == want


@pytest.mark.parametrize("min_size,thresh", [(5, 30.0), (3, 1e9), (8, 12.0)])
def test_eliminate_matches_reference_sim(ray_session, min_size, thresh):
    t, n = _fixture(40)
    ds = ray.data.from_arrow(t).repartition(4)
    cl = clump(ds, tile_size=16)
    df = cl.to_pandas().sort_values("pixel_id")
    label_grid = np.zeros((n, n), dtype=np.int64)
    label_grid[df["row"], df["col"]] = df["comp_label"]
    bands = np.zeros((n, n, 2))
    bands[df["row"], df["col"], 0] = df["band1"]
    bands[df["row"], df["col"], 1] = df["band2"]

    want = _sim_eliminate(label_grid, bands, min_size, thresh)
    out = (
        eliminate_small_clumps(
            cl, ["band1", "band2"], min_size, thresh, tile_size=16
        )
        .to_pandas()
        .sort_values("pixel_id")
    )
    got = np.zeros((n, n), dtype=np.int64)
    got[out["row"], out["col"]] = out["elim_label"]
    assert np.array_equal(got, want)


def test_eliminate_partition_independent(ray_session):
    t, n = _fixture(32)
    outs = []
    for parts, tsz in ((2, 8), (7, 16)):
        ds = ray.data.from_arrow(t).repartition(parts)
        cl = clump(ds, tile_size=tsz)
        out = (
            eliminate_small_clumps(
                cl, ["band1", "band2"], 5, 40.0, tile_size=tsz
            )
            .to_pandas()
            .sort_values("pixel_id")
            .reset_index(drop=True)
        )
        outs.append(out[["pixel_id", "elim_label"]])
    assert outs[0].equals(outs[1])


def test_huge_threshold_kills_all_small(ray_session):
    t, n = _fixture(40)
    ds = ray.data.from_arrow(t).repartition(4)
    cl = clump(ds, tile_size=16)
    out = eliminate_small_clumps(
        cl, ["band1", "band2"], 5, 1e9, tile_size=16
    ).to_pandas()
    szs = out.groupby("elim_label").size()
    # every clump below min size had some larger neighbour to join
    assert (szs >= 5).all()


def test_singletons_single_sweep_exact(ray_session):
    t, n = _fixture(40)
    ds = ray.data.from_arrow(t).repartition(4)
    cl = clump(ds, tile_size=16)
    before = clump_sums(cl, ["band1"])
    n_singletons = int((before["n"] == 1).sum())
    assert n_singletons > 0
    out = eliminate_singletons(cl, ["band1", "band2"], 10**9, tile_size=16)
    after = out.to_pandas().groupby("elim_label").size()
    # with an effectively infinite threshold every singleton merges
    assert (after > 1).all()


def test_felzenszwalb_pinned_vs_naive(ray_session):
    """felzenszwalb_pinned vs an independent naive transcription
    (dict-based union-find with path lookup, same pinned rules);
    plus the min-size guarantee (connected grid -> every final
    component >= min_size) and partition independence."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from rsgislib_ray.pipelines.queries import _fz_src_tbl, _FZ_W
    from rsgislib_ray.stages.segmentation import felzenszwalb_pinned

    tbl = _fz_src_tbl()
    W = H = _FZ_W
    scale, min_size = 18, 5
    val = tbl["val"].to_numpy().astype(int).reshape(H, W)
    edges = []
    for d, (dr, dc) in enumerate([(0, 1), (1, 0), (1, 1), (-1, 1)]):
        for r in range(H):
            for c in range(W):
                r2, c2 = r + dr, c + dc
                if 0 <= r2 < H and 0 <= c2 < W:
                    edges.append(
                        (abs(int(val[r2, c2]) - int(val[r, c])), d,
                         r * W + c, r2 * W + c2)
                    )
    edges.sort()
    comp = list(range(W * H))
    cint = [0] * (W * H)
    size = [1] * (W * H)

    def merge(ra, rb, w):
        lo, hi = min(ra, rb), max(ra, rb)
        for i in range(len(comp)):
            if comp[i] == hi:
                comp[i] = lo
        cint[lo] = w
        size[lo] = size[lo] + size[hi]

    for w, d, u, v in edges:
        ra, rb = comp[u], comp[v]
        if ra != rb and (w - cint[ra]) * size[ra] < scale \
                and (w - cint[rb]) * size[rb] < scale:
            merge(ra, rb, w)
    for w, d, u, v in edges:
        ra, rb = comp[u], comp[v]
        if ra != rb and (size[ra] < min_size or size[rb] < min_size):
            merge(ra, rb, w)
    reps = sorted(set(comp))
    want = np.array([reps.index(comp[i]) + 1 for i in range(W * H)])

    ds = ray.data.from_arrow(tbl).repartition(5)
    got = (
        felzenszwalb_pinned(ds, W, H, scale=scale, min_size=min_size)
        .to_pandas().sort_values("pixel_id")["label"].to_numpy()
    )
    assert (got == want).all()
    # every final component is at least min_size (grid is connected)
    import collections

    sizes = collections.Counter(got.tolist())
    assert min(sizes.values()) >= min_size
    assert len(sizes) > 1
    ds2 = ray.data.from_arrow(tbl).repartition(11)
    got2 = (
        felzenszwalb_pinned(ds2, W, H, scale=scale, min_size=min_size)
        .to_pandas().sort_values("pixel_id")["label"].to_numpy()
    )
    assert (got == got2).all()


def test_random_walker_pinned_solves_dirichlet(ray_session):
    """The 800-round Jacobi relaxation reaches the exact Dirichlet
    solution (np.linalg.solve of the graph Laplacian system) within
    1e-5; the two seeded regions get distinct labels; partition
    independent."""
    import math

    import numpy as np
    import pyarrow as pa
    import ray.data

    from rsgislib_ray.pipelines.queries import (
        _rw_src_tbl, _RW_W, _RW_T,
    )
    from rsgislib_ray.stages.segmentation import random_walker_pinned

    tbl = _rw_src_tbl()
    W = _RW_W
    N = W * W
    val = tbl["val"].to_numpy().astype(int)
    marker = tbl["marker"].to_numpy().astype(int)
    S = int(val.max() - val.min())
    # exact Dirichlet solve on the weighted 4-neighbour graph
    A = np.zeros((N, N))
    b = np.zeros(N)
    seeds = {i: 1.0 if marker[i] == 1 else 0.0
             for i in range(N) if marker[i] != 0}
    for i in range(N):
        r, c = divmod(i, W)
        nbrs = []
        if r > 0:
            nbrs.append(i - W)
        if c < W - 1:
            nbrs.append(i + 1)
        if r < W - 1:
            nbrs.append(i + W)
        if c > 0:
            nbrs.append(i - 1)
        if i in seeds:
            A[i, i] = 1.0
            b[i] = seeds[i]
            continue
        den = 0.0
        for j in nbrs:
            w = math.exp(-(130.0 * (float((val[i] - val[j]) ** 2)
                                    / float(S * S))))
            den += w
            if j in seeds:
                b[i] += w * seeds[j]
            else:
                A[i, j] = -w
        A[i, i] = den
    x_exact = np.linalg.solve(A, b)

    ds = ray.data.from_arrow(tbl).repartition(4)
    got = (
        random_walker_pinned(ds, W, W, beta=130.0, iters=_RW_T)
        .to_pandas().sort_values("pixel_id")
    )
    assert np.abs(got["prob1"].to_numpy() - x_exact).max() < 1e-5
    lab = got["label"].to_numpy()
    assert (lab[marker == 1] == 1).all()
    assert (lab[marker == 2] == 2).all()
    assert set(lab.tolist()) == {1, 2}
    ds2 = ray.data.from_arrow(tbl).repartition(9)
    got2 = (
        random_walker_pinned(ds2, W, W, beta=130.0, iters=_RW_T)
        .to_pandas().sort_values("pixel_id")
    )
    assert (got.to_numpy() == got2.to_numpy()).all()
