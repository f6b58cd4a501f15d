"""Watershed segmentation (stages/watershed.py): brute-force parity
with the pinned (minimax, min-label) semantics, partition
independence, and the oracle's iteration-count guard."""

import heapq

import numpy as np
import pyarrow as pa
import ray.data

from rsgislib_ray.stages.watershed import watershed_segmentation


def _brute(elev, markers):
    """Scalar reference: V by multi-source bottleneck Dijkstra, then
    min-label over optimal edges to fixpoint."""
    h, w = elev.shape
    INF = 1 << 62
    V = np.full((h, w), INF, dtype=np.int64)
    pq = []
    for r in range(h):
        for c in range(w):
            if markers[r, c] > 0:
                V[r, c] = elev[r, c]
                heapq.heappush(pq, (int(elev[r, c]), r, c))
    while pq:
        d, r, c = heapq.heappop(pq)
        if d > V[r, c]:
            continue
        for dr, dc in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            rr, cc = r + dr, c + dc
            if 0 <= rr < h and 0 <= cc < w:
                nd = max(d, int(elev[rr, cc]))
                if nd < V[rr, cc]:
                    V[rr, cc] = nd
                    heapq.heappush(pq, (nd, rr, cc))
    L = np.where(markers > 0, markers, INF).astype(np.int64)
    changed = True
    while changed:
        changed = False
        for r in range(h):
            for c in range(w):
                for dr, dc in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                    rr, cc = r + dr, c + dc
                    if 0 <= rr < h and 0 <= cc < w:
                        if (
                            max(V[rr, cc], elev[r, c]) == V[r, c]
                            and L[rr, cc] < L[r, c]
                        ):
                            L[r, c] = L[rr, cc]
                            changed = True
    return V, L


def _raster(elev, markers):
    h, w = elev.shape
    pid = np.arange(h * w, dtype=np.int64)
    r, c = np.divmod(pid, w)
    return ray.data.from_arrow(
        pa.table(
            {
                "pixel_id": pid, "row": r, "col": c,
                "dem": elev.ravel().astype(np.int64),
                "marker": markers.ravel().astype(np.int64),
            }
        )
    ).repartition(4)


def test_watershed_brute_force_parity(ray_session):
    rng = np.random.RandomState(6)
    elev = rng.randint(0, 30, size=(14, 14)).astype(np.int64)
    markers = np.zeros((14, 14), np.int64)
    for i, (r, c) in enumerate(
        [(1, 2), (5, 9), (11, 4), (12, 12), (7, 1)]
    ):
        markers[r, c] = i + 1
    V, L = _brute(elev, markers)
    out = watershed_segmentation(
        _raster(elev, markers), 14, 14, row_band=5
    ).sort("pixel_id").take_all()
    for row in out:
        r, c = divmod(row["pixel_id"], 14)
        assert row["label"] == L[r, c]
        assert row["crest"] == V[r, c]
        # marker pixels keep their own label + elevation
        if markers[r, c] > 0:
            assert row["label"] == markers[r, c]
            assert row["crest"] == elev[r, c]
        assert row["crest"] >= elev[r, c]


def test_watershed_partition_independence(ray_session):
    rng = np.random.RandomState(11)
    elev = rng.randint(0, 40, size=(20, 16)).astype(np.int64)
    markers = np.zeros((20, 16), np.int64)
    markers[2, 3] = 7
    markers[17, 12] = 3
    markers[9, 8] = 11
    a = watershed_segmentation(
        _raster(elev, markers), 16, 20, row_band=3
    ).sort("pixel_id").take_all()
    b = watershed_segmentation(
        _raster(elev, markers), 16, 20, row_band=20
    ).sort("pixel_id").take_all()
    assert a == b


def test_oracle_round_count_guard(ray_session):
    """Synchronous Jacobi rounds on the contract fixture stay under
    _WS_K for BOTH phases (the oracle runs exactly _WS_K rounds)."""
    from rsgislib_ray.pipelines.queries import (
        _FILL_N,
        _WS_K,
        _ws_raster,
    )

    t = _ws_raster()
    INF = 1 << 62
    elev = np.full((_FILL_N, _FILL_N), INF, np.int64)
    markers = np.zeros((_FILL_N, _FILL_N), np.int64)
    pres = np.zeros((_FILL_N, _FILL_N), bool)
    r = t["row"].to_numpy()
    c = t["col"].to_numpy()
    elev[r, c] = t["dem"].to_numpy()
    markers[r, c] = t["marker"].to_numpy()
    pres[r, c] = True

    def jacobi_rounds(state, combine):
        rounds = 0
        while True:
            prev = state.copy()
            cand = [prev]
            for dr, dc, sl_to, sl_from in (
                (1, 0, np.s_[1:, :], np.s_[:-1, :]),
                (-1, 0, np.s_[:-1, :], np.s_[1:, :]),
                (0, 1, np.s_[:, 1:], np.s_[:, :-1]),
                (0, -1, np.s_[:, :-1], np.s_[:, 1:]),
            ):
                nxt = np.full_like(prev, INF)
                nxt[sl_to] = combine(prev[sl_from], sl_to)
                cand.append(nxt)
            state = np.minimum.reduce(cand)
            rounds += 1
            if np.array_equal(state, prev):
                return state, rounds

    v0 = np.where(markers > 0, elev, INF)
    V, r1 = jacobi_rounds(
        v0, lambda src, sl: np.maximum(src, elev[sl])
    )
    l0 = np.where(markers > 0, markers, INF)
    # labels: explicit jacobi with qualification
    L = l0.copy()
    r2 = 0
    while True:
        prev = L.copy()
        cand = [prev]
        for sl_to, sl_from in (
            (np.s_[1:, :], np.s_[:-1, :]),
            (np.s_[:-1, :], np.s_[1:, :]),
            (np.s_[:, 1:], np.s_[:, :-1]),
            (np.s_[:, :-1], np.s_[:, 1:]),
        ):
            nxt = np.full_like(prev, INF)
            ok = np.maximum(V[sl_from], elev[sl_to]) == V[sl_to]
            nxt[sl_to] = np.where(ok, prev[sl_from], INF)
            cand.append(nxt)
        L = np.minimum.reduce(cand)
        r2 += 1
        if np.array_equal(L, prev):
            break
    assert r1 < _WS_K and r2 < _WS_K, (r1, r2)
