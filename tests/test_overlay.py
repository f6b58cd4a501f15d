"""Overlay identity/union: scanline-kernel correctness vs a brute
pixel-grid union, piece-area conservation, and partition independence."""

import numpy as np
import pyarrow as pa
import pytest

from rsgislib_ray.stages.overlay import (
    _interval_union_area,
    overlay_identity,
    overlay_union,
)


def _brute_union(x0, x1, y0, y1, res=1):
    """Integer-grid union area (all fixture coords are integers)."""
    gx = int(max(x1, default=0)) + 1
    gy = int(max(y1, default=0)) + 1
    g = np.zeros((gx, gy), dtype=bool)
    for a, b, c, d in zip(x0, x1, y0, y1):
        g[int(a) : int(b), int(c) : int(d)] = True
    return float(g.sum())


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_interval_union_matches_brute(seed):
    rng = np.random.default_rng(seed)
    n = 40
    x0 = rng.integers(0, 50, n).astype(float)
    x1 = x0 + rng.integers(0, 20, n)
    y0 = rng.integers(0, 50, n).astype(float)
    y1 = y0 + rng.integers(0, 20, n)
    assert _interval_union_area(x0, x1, y0, y1) == _brute_union(x0, x1, y0, y1)


def test_interval_union_degenerate():
    z = np.zeros(0)
    assert _interval_union_area(z, z, z, z) == 0.0
    # zero-width pieces (the phantom rows) contribute nothing
    assert (
        _interval_union_area(
            np.array([3.0, 1.0]),
            np.array([3.0, 4.0]),
            np.array([0.0, 0.0]),
            np.array([9.0, 2.0]),
        )
        == 6.0
    )


def _zones_table(rng, n=60):
    xmin = rng.integers(0, 88, n).astype(float)
    ymin = rng.integers(0, 88, n).astype(float)
    return pa.table(
        {
            "fid": np.arange(n, dtype=np.int64),
            "xmin": xmin,
            "xmax": xmin + rng.integers(4, 13, n),
            "ymin": ymin,
            "ymax": ymin + rng.integers(4, 13, n),
        }
    )


def test_identity_conserves_area_and_union_covers_plane(ray_session):
    import ray

    rng = np.random.default_rng(7)
    t = _zones_table(rng)
    ds = ray.data.from_arrow(t).repartition(5)
    ident = overlay_identity(ds).to_pandas()
    # per-feature piece areas sum exactly to the feature area
    per = ident.groupby("fid")["piece_area"].sum()
    areas = (
        (t["xmax"].to_numpy() - t["xmin"].to_numpy())
        * (t["ymax"].to_numpy() - t["ymin"].to_numpy())
    )
    assert np.array_equal(per.loc[np.arange(len(t))].to_numpy(), areas)
    # identity never emits B-only rows
    assert (ident["fid"] >= 0).all()

    un = overlay_union(ray.data.from_arrow(t).repartition(5)).to_pandas()
    # union ⊇ identity rows
    assert len(un) >= len(ident)
    bonly = un[un["fid"] < 0]
    # B-residual + covered piece area per tile == the full tile area
    pieces = un[(un["fid"] >= 0) & (un["tile_id"] >= 0)]
    for tid, resid in zip(bonly["tile_id"], bonly["piece_area"]):
        sub = pieces[pieces["tile_id"] == tid]
        cov = _brute_union(
            *(
                np.array(v)
                for v in _clips(t, int(tid))
            )
        )
        assert resid == 169.0 - cov


def _clips(t, tid):
    tc, tr = tid % 8, tid // 8
    tx0, tx1 = tc * 13.0, tc * 13.0 + 13.0
    ty0, ty1 = tr * 13.0, tr * 13.0 + 13.0
    x0 = np.maximum(t["xmin"].to_numpy(), tx0)
    x1 = np.minimum(t["xmax"].to_numpy(), tx1)
    y0 = np.maximum(t["ymin"].to_numpy(), ty0)
    y1 = np.minimum(t["ymax"].to_numpy(), ty1)
    keep = (x1 > x0) & (y1 > y0)
    return x0[keep], x1[keep], y0[keep], y1[keep]


def _pieces_cover(pieces, px, py):
    """Membership count of each sample point across pieces (> 1 means
    overlap, 0 means hole)."""
    from rsgislib_ray.functions import geom as G

    cnt = np.zeros(len(px), dtype=np.int64)
    for p in pieces:
        cnt += G.points_in_ring(px, py, p).astype(np.int64)
    return cnt


def test_concave_concave_pieces_monte_carlo():
    """polygon_intersection / union / symdiff pieces over two genuinely
    concave, non-axis-aligned simple polygons: the pieces tile the
    boolean region exactly — every interior sample point is covered by
    EXACTLY ONE piece, every exterior point by none, and total area
    matches the even-odd brute within float noise."""
    from rsgislib_ray.functions import geom as G

    # a 4-point star (concave octagon) and a concave dart, both with
    # non-axis-aligned edges
    star = np.array(
        [0.0, 0.0, 8.0, 3.0, 16.0, 0.0, 12.0, 8.0, 16.0, 16.0,
         8.0, 12.0, 0.0, 16.0, 4.0, 8.0]
    )
    arrow = np.array([2.0, -1.0, 18.0, 8.0, 2.0, 17.0, 7.0, 8.0])
    rng = np.random.default_rng(17)
    px = rng.uniform(-3, 21, 4000)
    py = rng.uniform(-3, 21, 4000)
    in_a = G.points_in_ring(px, py, star)
    in_b = G.points_in_ring(px, py, arrow)
    cases = {
        "inter": (G.polygon_intersection(star, arrow), in_a & in_b),
        "union": (G.polygon_union_pieces(star, arrow), in_a | in_b),
        "symdiff": (G.polygon_symdiff_pieces(star, arrow), in_a ^ in_b),
    }
    for name, (pieces, want) in cases.items():
        cnt = _pieces_cover(pieces, px, py)
        # boundary-adjacent samples can land on shared piece edges;
        # tolerate a tiny fraction of edge hits, none with cnt > 1
        # deep inside
        agree = (cnt == want.astype(np.int64)).mean()
        assert agree > 0.995, (name, agree)
        assert (cnt <= 1).mean() > 0.999, name  # disjointness
        area = sum(G.ring_area(p) for p in pieces)
        # brute area estimate from the sample (24x24 box)
        est = want.mean() * 24.0 * 24.0
        assert abs(area - est) < 0.05 * 24 * 24, (name, area, est)


def test_union_partition_independent(ray_session):
    import ray

    rng = np.random.default_rng(11)
    t = _zones_table(rng, n=45)

    def run(parts):
        df = overlay_union(
            ray.data.from_arrow(t).repartition(parts)
        ).to_pandas()
        return df.sort_values(["fid", "tile_id"]).reset_index(drop=True)

    a, b = run(2), run(7)
    assert a.equals(b)
