"""NNLS unmixing (stages/imagestats.nnls_unmix): KKT subset solution
vs a from-scratch Lawson-Hanson active-set solver (scipy absent), and
the KKT optimality properties."""

import numpy as np
import pyarrow as pa
import ray.data

from rsgislib_ray.stages.imagestats import nnls_unmix


def _lawson_hanson(A, y, iters=50):
    """Textbook Lawson-Hanson 1974 NNLS (A: nb x m)."""
    m = A.shape[1]
    P = np.zeros(m, bool)
    x = np.zeros(m)
    w = A.T @ (y - A @ x)
    for _ in range(iters):
        if P.all() or w[~P].max(initial=-1) <= 1e-12:
            break
        j = int(np.arange(m)[~P][np.argmax(w[~P])])
        P[j] = True
        while True:
            s = np.zeros(m)
            Ap = A[:, P]
            s[P] = np.linalg.lstsq(Ap, y, rcond=None)[0]
            if s[P].min() > 0:
                x = s
                break
            alpha = min(
                x[i] / (x[i] - s[i])
                for i in range(m)
                if P[i] and s[i] <= 0
            )
            x = x + alpha * (s - x)
            P = P & (x > 1e-12)
            x[~P] = 0.0
        w = A.T @ (y - A @ x)
    return x


def _run(E, Y, weight=None):
    cols = {"pix": np.arange(len(Y), dtype=np.int64)}
    for b in range(Y.shape[1]):
        cols[f"y{b}"] = Y[:, b]
    ds = ray.data.from_arrow(pa.table(cols)).repartition(4)
    out = nnls_unmix(
        ds, [f"y{b}" for b in range(Y.shape[1])], E, weight=weight
    ).sort("pix").take_all()
    return np.array([[r["a0"], r["a1"], r["a2"]] for r in out])


E = np.array(
    [[12, 3, 7, 1, 9], [2, 14, 5, 8, 3], [6, 2, 11, 13, 4]],
    dtype=np.int64,
)


def test_nnls_matches_lawson_hanson(ray_session):
    rng = np.random.RandomState(5)
    Y = rng.randint(0, 180, size=(200, 5)).astype(np.int64)
    X = _run(E, Y)
    supports = set()
    for r in range(200):
        want = _lawson_hanson(E.T.astype(np.float64),
                              Y[r].astype(np.float64))
        assert np.allclose(X[r], want, atol=1e-8), r
        supports.add(tuple(X[r] > 0))
    # the fixture must exercise several KKT supports
    assert len(supports) >= 3


def test_nnls_weighted_kkt_properties(ray_session):
    rng = np.random.RandomState(9)
    Y = rng.randint(0, 180, size=(150, 5)).astype(np.int64)
    X = _run(E, Y, weight=4)
    Aw = np.hstack([E.astype(np.float64),
                    np.full((3, 1), 4.0)]).T      # (6, 3)
    for r in range(150):
        yw = np.concatenate([Y[r].astype(np.float64), [16.0 / 4.0]])
        # weighted target appends the weight value itself
        yw[-1] = 4.0
        x = X[r]
        assert (x >= -1e-12).all()
        grad = Aw.T @ (yw - Aw @ x)
        # dual feasibility on the zero set, stationarity on support
        assert grad[x <= 1e-12].max(initial=-np.inf) <= 1e-6
        assert np.abs(grad[x > 1e-12]).max(initial=0.0) <= 1e-6


def test_fcls_optimality_and_constraints(ray_session):
    """FCLS: abundances sum to 1, are non-negative, satisfy the KKT
    conditions numerically, and beat random simplex points (Monte-Carlo
    optimality — the uniqueness argument of the docstring)."""
    import pyarrow as pa
    from rsgislib_ray.stages.imagestats import fcls_unmix

    rng = np.random.RandomState(7)
    E = np.array(
        [[12, 1, 0, 3, 2], [0, 11, 2, 3, 1], [1, 0, 10, 2, 4]], np.int64
    )
    n = 300
    Y = rng.randint(0, 190, size=(n, 5)).astype(np.int64)
    tbl = pa.table(
        {"pix": np.arange(n, dtype=np.int64)}
        | {f"y{b}": Y[:, b] for b in range(5)}
    )
    out = (
        fcls_unmix(
            ray.data.from_arrow(tbl), [f"y{b}" for b in range(5)], E
        )
        .to_pandas()
        .sort_values("pix")
    )
    A = out[["a0", "a1", "a2"]].to_numpy()
    assert np.all(A >= 0.0)
    assert np.allclose(A.sum(1), 1.0, atol=1e-12)

    def obj(a, y):
        r = a @ E - y
        return float((r * r).sum())

    G = (E @ E.T).astype(float)
    for i in range(n):
        o_star = obj(A[i], Y[i])
        for _ in range(40):
            w = rng.dirichlet([1.0, 1.0, 1.0])
            assert obj(w, Y[i]) >= o_star - 1e-9 * max(1.0, o_star)
        g = G @ A[i] - E @ Y[i].astype(float)
        sup = A[i] > 1e-12
        lam = -g[sup].mean()
        assert np.ptp(g[sup]) < 1e-6          # stationarity on support
        assert np.all(g[~sup] + lam > -1e-6)  # dual feasibility off it
