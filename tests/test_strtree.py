"""STRtree candidate generation vs brute-force bbox scans."""

import numpy as np

from rsgislib_ray.state.strtree import STRtree


def _rand_bounds(rng, n, lo=0.0, hi=100.0, max_sz=8.0):
    x0 = rng.uniform(lo, hi, n)
    y0 = rng.uniform(lo, hi, n)
    w = rng.uniform(0.1, max_sz, n)
    h = rng.uniform(0.1, max_sz, n)
    return np.column_stack([x0, x0 + w, y0, y0 + h])


def _pairs_set(q, i):
    return set(zip(q.tolist(), i.tolist()))


def test_query_points_vs_brute():
    rng = np.random.default_rng(42)
    for n_items in (0, 1, 7, 16, 17, 300, 5000):
        b = _rand_bounds(rng, n_items)
        tree = STRtree(b)
        px = rng.uniform(-5, 105, 777)
        py = rng.uniform(-5, 105, 777)
        q, it = tree.query_points(px, py)
        want = set()
        for j in range(n_items):
            hit = (
                (px >= b[j, 0]) & (px <= b[j, 1]) & (py >= b[j, 2]) & (py <= b[j, 3])
            )
            want |= {(int(p), j) for p in np.flatnonzero(hit)}
        assert _pairs_set(q, it) == want


def test_query_bboxes_vs_brute():
    rng = np.random.default_rng(1)
    b = _rand_bounds(rng, 400)
    tree = STRtree(b)
    qb = _rand_bounds(rng, 133, max_sz=20.0)
    q, it = tree.query_bboxes(qb)
    want = set()
    for j in range(len(b)):
        hit = (
            (qb[:, 1] >= b[j, 0])
            & (qb[:, 0] <= b[j, 1])
            & (qb[:, 3] >= b[j, 2])
            & (qb[:, 2] <= b[j, 3])
        )
        want |= {(int(p), j) for p in np.flatnonzero(hit)}
    assert _pairs_set(q, it) == want


def test_tree_is_picklable_and_stable():
    import pickle

    rng = np.random.default_rng(3)
    b = _rand_bounds(rng, 250)
    tree = STRtree(b)
    tree2 = pickle.loads(pickle.dumps(tree))
    px = rng.uniform(0, 100, 100)
    py = rng.uniform(0, 100, 100)
    q1, i1 = tree.query_points(px, py)
    q2, i2 = tree2.query_points(px, py)
    np.testing.assert_array_equal(q1, q2)
    np.testing.assert_array_equal(i1, i2)
