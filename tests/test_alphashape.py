"""Alpha-shape tests: brute-force parity, fixture degeneracy-freedom,
boundary topology (every boundary vertex has even degree >= 2)."""

from itertools import combinations

import numpy as np
import pyarrow as pa
import ray.data

from rsgislib_ray.stages.alphashape import (
    alpha_shape_edges,
    no_four_cocircular,
)


def _pts():
    i = np.arange(40, dtype=np.int64)
    return i, (i * 41) % 127, (i * 67) % 131


def _brute(px, py, r2max):
    kept = []
    n = len(px)
    for a, b, c in combinations(range(n), 3):
        cr = (px[b] - px[a]) * (py[c] - py[a]) - (py[b] - py[a]) * (
            px[c] - px[a]
        )
        if cr == 0:
            continue
        a2 = (px[b] - px[a]) ** 2 + (py[b] - py[a]) ** 2
        b2 = (px[c] - px[b]) ** 2 + (py[c] - py[b]) ** 2
        c2 = (px[a] - px[c]) ** 2 + (py[a] - py[c]) ** 2
        if int(a2) * int(b2) * int(c2) >= r2max * 4 * int(cr) * int(cr):
            continue
        ok = True
        for p in range(n):
            if p in (a, b, c):
                continue
            dxa, dya = px[a] - px[p], py[a] - py[p]
            dxb, dyb = px[b] - px[p], py[b] - py[p]
            dxc, dyc = px[c] - px[p], py[c] - py[p]
            fa, fb, fc = (
                dxa * dxa + dya * dya,
                dxb * dxb + dyb * dyb,
                dxc * dxc + dyc * dyc,
            )
            det = (
                dxa * (dyb * fc - dyc * fb)
                - dya * (dxb * fc - dxc * fb)
                + fa * (dxb * dyc - dxc * dyb)
            )
            if int(cr) * int(det) > 0:
                ok = False
                break
        if ok:
            kept.append((a, b, c))
    from collections import Counter

    ec = Counter()
    for a, b, c in kept:
        for e in ((a, b), (b, c), (a, c)):
            ec[e] += 1
    return sorted(e for e, cnt in ec.items() if cnt == 1)


def test_fixture_nondegenerate():
    _, px, py = _pts()
    assert len(set(zip(px.tolist(), py.tolist()))) == len(px)
    assert no_four_cocircular(px, py)


def test_alpha_shape_matches_bruteforce(ray_session):
    idx, px, py = _pts()
    ds = ray.data.from_arrow(
        pa.table({"pt_id": idx, "xi": px, "yi": py})
    ).repartition(4)
    out = (
        alpha_shape_edges(ds, r2max=2500, batch_size=512)
        .to_pandas()
        .sort_values(["i", "j"])
        .reset_index(drop=True)
    )
    exp = _brute(px, py, 2500)
    got = list(zip(out["i"].tolist(), out["j"].tolist()))
    assert got == exp
    # coordinates attached correctly
    assert (out["x1"].to_numpy() == px[out["i"].to_numpy()]).all()
    assert (out["y2"].to_numpy() == py[out["j"].to_numpy()]).all()
    # boundary of a 2-manifold complex: every vertex on the boundary
    # appears an even number of times
    deg = np.bincount(
        np.concatenate([out["i"].to_numpy(), out["j"].to_numpy()])
    )
    assert (deg[deg > 0] % 2 == 0).all()
