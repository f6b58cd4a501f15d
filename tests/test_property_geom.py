"""Property-based (hypothesis) invariants for the geometry kernels —
mirrors the reference's parametrized-fixture test style (SURVEY §5)
with generated inputs instead of fixed fixtures."""

import numpy as np
from hypothesis import given, settings, strategies as st

from rsgislib_ray.functions.geom import (
    clip_halfplane,
    clip_polygon_convex,
    convex_difference,
    convex_symdiff,
    points_in_ring,
    rect_ring,
    ring_area,
    ring_centroid,
    simplify_ring,
)

rects = st.tuples(
    st.floats(0, 80), st.floats(0, 80),
    st.floats(0.5, 20), st.floats(0.5, 20),
).map(lambda t: (t[0], t[1], t[0] + t[2], t[1] + t[3]))


@settings(max_examples=60, deadline=None)
@given(rects, rects)
def test_difference_symdiff_area_identities(a, b):
    A = rect_ring(a[0], a[1], a[2], a[3])
    B = rect_ring(b[0], b[1], b[2], b[3])
    iw = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    ih = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    area_a = (a[2] - a[0]) * (a[3] - a[1])
    area_b = (b[2] - b[0]) * (b[3] - b[1])
    d = sum(ring_area(p) for p in convex_difference(A, B))
    assert abs(d - (area_a - iw * ih)) < 1e-6
    s = sum(ring_area(p) for p in convex_symdiff(A, B))
    assert abs(s - (area_a + area_b - 2 * iw * ih)) < 1e-6
    # clip(A, B) area == intersection area
    c = clip_polygon_convex(A, B)
    ca = ring_area(c) if len(c) >= 6 else 0.0
    assert abs(ca - iw * ih) < 1e-6


@settings(max_examples=40, deadline=None)
@given(rects, st.floats(-50, 50), st.floats(-1, 1), st.floats(-1, 1))
def test_halfplane_partition(r, c, nx, ny):
    """A half-plane clip and its complement partition the rect area."""
    if abs(nx) + abs(ny) < 1e-3:
        return
    A = rect_ring(r[0], r[1], r[2], r[3])
    area = (r[2] - r[0]) * (r[3] - r[1])
    ax, ay = 40 + c * 0.3, 40 - c * 0.2
    bx, by = ax + nx, ay + ny
    left = clip_halfplane(A, ax, ay, bx, by)
    right = clip_halfplane(A, bx, by, ax, ay)
    la = ring_area(left) if len(left) >= 6 else 0.0
    ra = ring_area(right) if len(right) >= 6 else 0.0
    assert abs((la + ra) - area) < 1e-6


@settings(max_examples=40, deadline=None)
@given(rects, st.integers(1, 6))
def test_simplify_densified_rect_recovers_corners(r, k):
    """A rect densified with k collinear points per edge simplifies
    back to exactly 4 corners with the exact area."""
    xs = []
    corners = [
        (r[0], r[1]), (r[2], r[1]), (r[2], r[3]), (r[0], r[3]),
    ]
    for i in range(4):
        x0, y0 = corners[i]
        x1, y1 = corners[(i + 1) % 4]
        for j in range(k + 1):
            t = j / (k + 1)
            xs.extend([x0 + t * (x1 - x0), y0 + t * (y1 - y0)])
    simp = simplify_ring(np.asarray(xs), 1e-9)
    assert len(simp) // 2 == 4
    assert abs(abs(ring_area(simp)) - (r[2] - r[0]) * (r[3] - r[1])) < 1e-9


@settings(max_examples=40, deadline=None)
@given(rects)
def test_centroid_inside_and_pip_consistency(r):
    A = rect_ring(r[0], r[1], r[2], r[3])
    cx, cy = ring_centroid(A)
    assert abs(cx - (r[0] + r[2]) / 2) < 1e-9
    assert abs(cy - (r[1] + r[3]) / 2) < 1e-9
    assert points_in_ring(np.array([cx]), np.array([cy]), A).all()
    # a point clearly outside
    assert not points_in_ring(np.array([r[2] + 1.0]), np.array([cy]), A).any()
