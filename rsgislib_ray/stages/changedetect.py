"""Iteratively-reweighted change detection: IR-MAD and ISFA.

Reference surface: changedetect/imgchngmthds.py —
``multivariate_alteration_detection`` (:820, IR-MAD, Nielsen 2007 via
canonical correlation analysis) and ``slow_feature_analysis`` (:521,
ISFA, Wu/Du/Zhang 2014).  Both are the same physical shape: per
iteration, a WEIGHTED cross-moment reduction over all pixels feeds a
tiny C x C eigenproblem on the driver, whose result is broadcast back
to recompute per-pixel chi-square weights for the next pass.

Ray-Data plan (zero shuffles): each iteration is ONE ``map_batches``
pass emitting a single bounded partial row per batch (the weighted
sums); partials combine on the driver in Python big-ints.  Per-pixel
weights are RECOMPUTED inside the next pass from the broadcast scalar
state — never materialized.  At 100 TB the driver holds O(blocks x
C^2) integers per iteration and the eigenproblem stays C x C.

Exactness: weights are quantized to 2^-24 units (documented
deviation <= 2^-25 per weight from the reference's float weights), so
every reduction is an order-independent exact integer sum; all float
math is a fixed chain over those exact integers.  The 2-band MAD path
expresses the ENTIRE loop — weighted covariances, the closed-form
2x2 CCA, eigenvector normalization, per-pixel variates, dof-2
chi-square weights (1 - cdf = exp(-T/2), elementary) — as shared
mirrorchain strings, so the SQL oracle replays it bit-exactly.

scipy is absent from this environment; ``chi2_sf`` implements the
chi-square survival function from the elementary closed forms (even
dof: the Poisson partial sum; odd dof: the erfc + half-integer
series, vectorized math.erfc).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import ray.data

from rsgislib_ray.functions.mirrorchain import Chain, eval_chain

WEIGHT_SCALE = 16777216  # 2^24: weight quantum for exact int sums

_erfc_vec = np.vectorize(math.erfc, otypes=[np.float64])


def chi2_sf(t: np.ndarray, k: int) -> np.ndarray:
    """Survival function 1 - chi2.cdf(t, k), scipy-free.

    Even k = 2m:   exp(-t/2) * sum_{j<m} (t/2)^j / j!
    Odd  k = 2m+1: erfc(sqrt(t/2))
                   + exp(-t/2) * sum_{j=1..m} (t/2)^(j-1/2) / G(j+1/2)

    Both are the textbook regularized upper incomplete gamma closed
    forms for (half-)integer shape — identical functions to scipy's
    chi2.sf, evaluated directly."""
    t = np.asarray(t, dtype=np.float64)
    h = t / 2.0
    if k % 2 == 0:
        m = k // 2
        acc = np.zeros_like(h)
        term = np.ones_like(h)
        for j in range(m):
            if j > 0:
                term = term * h / j
            acc = acc + term
        return np.exp(-h) * acc
    m = (k - 1) // 2
    out = _erfc_vec(np.sqrt(h))
    if m:
        g = math.sqrt(math.pi) / 2.0  # Gamma(3/2)
        term = np.sqrt(h)
        acc = term / g
        for j in range(2, m + 1):
            g = g * (j - 0.5)
            term = term * h
            acc = acc + term / g
        out = out + np.exp(-h) * acc
    return out


# ---------------------------------------------------------------------------
# weighted cross-moments (one pass per IR iteration)
# ---------------------------------------------------------------------------


def _moment_names(cx: int, cy: int) -> list[str]:
    names = ["sw"]
    names += [f"sx{i + 1}" for i in range(cx)]
    names += [f"sy{i + 1}" for i in range(cy)]
    names += [f"qx{i + 1}{j + 1}" for i in range(cx) for j in range(i, cx)]
    names += [f"qy{i + 1}{j + 1}" for i in range(cy) for j in range(i, cy)]
    names += [f"c{i + 1}{j + 1}" for i in range(cx) for j in range(cy)]
    return names


def weighted_cross_moments(
    ds: ray.data.Dataset,
    x_cols: list[str],
    y_cols: list[str],
    weight_fn=None,
    batch_size: int = 32768,
) -> dict:
    """One streaming pass: exact integer weighted sums ``sw, Sw*x_i,
    Sw*y_i, Sw*x_i*x_j, Sw*y_i*y_j, Sw*x_i*y_j`` with integer weights
    from ``weight_fn(batch) -> int64 array`` (None -> WEIGHT_SCALE,
    i.e. w == 1).  Per-batch int64 partials (batch_size bounds the
    headroom: rows * maxw * max|x*y| must stay < 2^63 per batch),
    cross-batch combine in Python big-ints — one tiny row per batch
    reaches the driver, nothing else."""
    cx, cy = len(x_cols), len(y_cols)
    names = _moment_names(cx, cy)

    def partial(batch: pa.Table) -> pa.Table:
        xs = [batch[c].to_numpy().astype(np.int64) for c in x_cols]
        ys = [batch[c].to_numpy().astype(np.int64) for c in y_cols]
        w = (
            np.full(len(batch), WEIGHT_SCALE, dtype=np.int64)
            if weight_fn is None
            else weight_fn(batch)
        )
        out: dict = {
            "n": np.array([len(batch)], dtype=np.int64),
            "sw": np.array([int(w.sum())], dtype=np.int64),
        }
        for i in range(cx):
            out[f"sx{i + 1}"] = np.array([int(np.dot(w, xs[i]))], np.int64)
        for i in range(cy):
            out[f"sy{i + 1}"] = np.array([int(np.dot(w, ys[i]))], np.int64)
        for i in range(cx):
            for j in range(i, cx):
                out[f"qx{i + 1}{j + 1}"] = np.array(
                    [int((w * xs[i] * xs[j]).sum())], np.int64
                )
        for i in range(cy):
            for j in range(i, cy):
                out[f"qy{i + 1}{j + 1}"] = np.array(
                    [int((w * ys[i] * ys[j]).sum())], np.int64
                )
        for i in range(cx):
            for j in range(cy):
                out[f"c{i + 1}{j + 1}"] = np.array(
                    [int((w * xs[i] * ys[j]).sum())], np.int64
                )
        return pa.table(out)

    pdf = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size
    ).to_pandas()
    m = {k: int(pdf[k].sum()) for k in names}
    m["n"] = int(pdf["n"].sum())
    return m


# ---------------------------------------------------------------------------
# 2-band IR-MAD: the shared mirror chains
# ---------------------------------------------------------------------------


def mad_scalar_chain(t: str) -> Chain:
    """Scalar chain for one IR-MAD iteration over 2+2 bands: weighted
    means, the covariance blocks via the algebraic expansion
    Sw(u-mu)(v-mv) = C - mu*Sv - mv*Su + mu*mv*Sw (every inner sum an
    exact integer, the reference's _covw n/(n-1) factor kept), the
    closed-form 2x2 CCA target inv(S11)S12inv(S22)S21, eigenpairs via
    the quadratic formula, Y-side vectors inv(S22)S21vX, and the
    reference's SQRT(1/(v'Sv)) normalization.  Sign fixed
    conditional-free by sg = t12/|t12| (requires t12 != 0 — asserted
    by the caller); ascending eigenvalue order = (lo, hi), matching
    the reference argsort.  All inputs ``*_{t}`` are exact ints."""
    s = lambda n: f"{n}_{t}"  # noqa: E731
    ch: Chain = []
    a = ch.append
    a((s("mx1"), f"{s('sx1')} / {s('sw')}"))
    a((s("mx2"), f"{s('sx2')} / {s('sw')}"))
    a((s("my1"), f"{s('sy1')} / {s('sw')}"))
    a((s("my2"), f"{s('sy2')} / {s('sw')}"))
    a((s("nf"), "n / (n - 1)"))

    def cov(out, q, su, sv, mu, mv):
        a(
            (
                s(out),
                f"({s(q)} - {s(mu)}*{s(sv)} - {s(mv)}*{s(su)}"
                f" + {s(mu)}*{s(mv)}*{s('sw')}) / {s('sw')} * {s('nf')}",
            )
        )

    cov("s11a", "qx11", "sx1", "sx1", "mx1", "mx1")
    cov("s11b", "qx12", "sx1", "sx2", "mx1", "mx2")
    cov("s11c", "qx22", "sx2", "sx2", "mx2", "mx2")
    cov("s22a", "qy11", "sy1", "sy1", "my1", "my1")
    cov("s22b", "qy12", "sy1", "sy2", "my1", "my2")
    cov("s22c", "qy22", "sy2", "sy2", "my2", "my2")
    cov("g11", "c11", "sx1", "sy1", "mx1", "my1")
    cov("g12", "c12", "sx1", "sy2", "mx1", "my2")
    cov("g21", "c21", "sx2", "sy1", "mx2", "my1")
    cov("g22", "c22", "sx2", "sy2", "mx2", "my2")
    a((s("d11"), f"{s('s11a')}*{s('s11c')} - {s('s11b')}*{s('s11b')}"))
    a((s("d22"), f"{s('s22a')}*{s('s22c')} - {s('s22b')}*{s('s22b')}"))
    # A = inv(S11) @ S12 ; B = inv(S22) @ S21 (S21 = S12')
    a((s("a11"), f"({s('s11c')}*{s('g11')} - {s('s11b')}*{s('g21')}) / {s('d11')}"))
    a((s("a12"), f"({s('s11c')}*{s('g12')} - {s('s11b')}*{s('g22')}) / {s('d11')}"))
    a((s("a21"), f"({s('s11a')}*{s('g21')} - {s('s11b')}*{s('g11')}) / {s('d11')}"))
    a((s("a22"), f"({s('s11a')}*{s('g22')} - {s('s11b')}*{s('g12')}) / {s('d11')}"))
    a((s("b11"), f"({s('s22c')}*{s('g11')} - {s('s22b')}*{s('g12')}) / {s('d22')}"))
    a((s("b12"), f"({s('s22c')}*{s('g21')} - {s('s22b')}*{s('g22')}) / {s('d22')}"))
    a((s("b21"), f"({s('s22a')}*{s('g12')} - {s('s22b')}*{s('g11')}) / {s('d22')}"))
    a((s("b22"), f"({s('s22a')}*{s('g22')} - {s('s22b')}*{s('g21')}) / {s('d22')}"))
    a((s("t11"), f"{s('a11')}*{s('b11')} + {s('a12')}*{s('b21')}"))
    a((s("t12"), f"{s('a11')}*{s('b12')} + {s('a12')}*{s('b22')}"))
    a((s("t21"), f"{s('a21')}*{s('b11')} + {s('a22')}*{s('b21')}"))
    a((s("t22"), f"{s('a21')}*{s('b12')} + {s('a22')}*{s('b22')}"))
    a((s("tr"), f"{s('t11')} + {s('t22')}"))
    a((s("dt"), f"{s('t11')}*{s('t22')} - {s('t12')}*{s('t21')}"))
    a((s("disc"), f"SQRT({s('tr')}*{s('tr')} - 4.0e0*{s('dt')})"))
    a((s("llo"), f"({s('tr')} - {s('disc')}) / 2.0e0"))
    a((s("lhi"), f"({s('tr')} + {s('disc')}) / 2.0e0"))
    a((s("rlo"), f"SQRT({s('llo')})"))
    a((s("rhi"), f"SQRT({s('lhi')})"))
    a((s("sg"), f"{s('t12')} / ABS({s('t12')})"))
    for v, lam in (("l", "llo"), ("h", "lhi")):
        a((s(f"ux{v}1"), f"{s('t12')} * {s('sg')}"))
        a((s(f"ux{v}2"), f"({s(lam)} - {s('t11')}) * {s('sg')}"))
        a(
            (
                s(f"py{v}1"),
                f"{s('g11')}*{s(f'ux{v}1')} + {s('g21')}*{s(f'ux{v}2')}",
            )
        )
        a(
            (
                s(f"py{v}2"),
                f"{s('g12')}*{s(f'ux{v}1')} + {s('g22')}*{s(f'ux{v}2')}",
            )
        )
        a(
            (
                s(f"uy{v}1"),
                f"({s('s22c')}*{s(f'py{v}1')} - {s('s22b')}*{s(f'py{v}2')})"
                f" / {s('d22')}",
            )
        )
        a(
            (
                s(f"uy{v}2"),
                f"({s('s22a')}*{s(f'py{v}2')} - {s('s22b')}*{s(f'py{v}1')})"
                f" / {s('d22')}",
            )
        )
        a(
            (
                s(f"nx{v}"),
                f"SQRT(1.0e0 / ({s(f'ux{v}1')}*{s(f'ux{v}1')}*{s('s11a')}"
                f" + 2.0e0*{s(f'ux{v}1')}*{s(f'ux{v}2')}*{s('s11b')}"
                f" + {s(f'ux{v}2')}*{s(f'ux{v}2')}*{s('s11c')}))",
            )
        )
        a(
            (
                s(f"ny{v}"),
                f"SQRT(1.0e0 / ({s(f'uy{v}1')}*{s(f'uy{v}1')}*{s('s22a')}"
                f" + 2.0e0*{s(f'uy{v}1')}*{s(f'uy{v}2')}*{s('s22b')}"
                f" + {s(f'uy{v}2')}*{s(f'uy{v}2')}*{s('s22c')}))",
            )
        )
        for i in (1, 2):
            a((s(f"vx{v}{i}"), f"{s(f'nx{v}')} * {s(f'ux{v}{i}')}"))
            a((s(f"vy{v}{i}"), f"{s(f'ny{v}')} * {s(f'uy{v}{i}')}"))
    a((s("varlo"), f"2.0e0 * (1.0e0 - {s('rlo')})"))
    a((s("varhi"), f"2.0e0 * (1.0e0 - {s('rhi')})"))
    return ch


def mad_pixel_chain(t: str) -> Chain:
    """Per-pixel chain for iteration ``t``: centered bands, the two
    MAD variates (ascending-eigenvalue order), the chi-square distance
    with the reference's mad_var = 2(1 - rho), and the dof-2 weight
    w = 1 - chi2cdf(T, 2) = exp(-T/2).  Band inputs x1 x2 y1 y2."""
    s = lambda n: f"{n}_{t}"  # noqa: E731
    return [
        (s("cx1"), f"x1 - {s('mx1')}"),
        (s("cx2"), f"x2 - {s('mx2')}"),
        (s("cy1"), f"y1 - {s('my1')}"),
        (s("cy2"), f"y2 - {s('my2')}"),
        (
            s("madlo"),
            f"({s('vxl1')}*{s('cx1')} + {s('vxl2')}*{s('cx2')})"
            f" - ({s('vyl1')}*{s('cy1')} + {s('vyl2')}*{s('cy2')})",
        ),
        (
            s("madhi"),
            f"({s('vxh1')}*{s('cx1')} + {s('vxh2')}*{s('cx2')})"
            f" - ({s('vyh1')}*{s('cy1')} + {s('vyh2')}*{s('cy2')})",
        ),
        (
            s("chi2"),
            f"{s('madlo')}*{s('madlo')}/{s('varlo')}"
            f" + {s('madhi')}*{s('madhi')}/{s('varhi')}",
        ),
        (s("w"), f"EXP(-({s('chi2')})/2.0e0)"),
    ]


def _pixel_env(batch: pa.Table, x_cols, y_cols) -> dict:
    env = {}
    for k, c in enumerate(x_cols):
        env[f"x{k + 1}"] = batch[c].to_numpy().astype(np.int64)
    for k, c in enumerate(y_cols):
        env[f"y{k + 1}"] = batch[c].to_numpy().astype(np.int64)
    return env


def mad_fit_2band(
    ds: ray.data.Dataset,
    x_cols: list[str],
    y_cols: list[str],
    n_iters: int = 2,
    batch_size: int = 32768,
) -> tuple[ray.data.Dataset, dict]:
    """The mirrored 2-band IR-MAD: runs exactly ``n_iters`` weighted
    iterations (epsilon = 0 semantics) and emits per-pixel
    (mad_lo, mad_hi, chi2) from the FINAL iteration's canonical
    vectors — the reference loop with max_iter reached.  Returns
    (dataset, scalar_env) so the caller/oracle can inspect the chain.
    Bit-mirrored in SQL by replaying the same chains via chain_ctes."""
    assert len(x_cols) == 2 and len(y_cols) == 2
    env: dict = {}
    tag = ""
    for it in range(n_iters):
        tag = chr(ord("a") + it)
        if it == 0:
            wfn = None
        else:
            prev = chr(ord("a") + it - 1)
            scal = {
                k: v for k, v in env.items() if not isinstance(v, np.ndarray)
            }
            pxc = mad_pixel_chain(prev)

            def wfn(batch, _s=scal, _c=pxc, _p=prev):
                e = eval_chain(_c, {**_s, **_pixel_env(batch, x_cols, y_cols)}, vector=True)
                return np.floor(
                    e[f"w_{_p}"] * 16777216.0 + 0.5
                ).astype(np.int64)

        m = weighted_cross_moments(ds, x_cols, y_cols, wfn, batch_size)
        env["n"] = m["n"]
        for k, v in m.items():
            if k != "n":
                env[f"{k}_{tag}"] = v
        env = eval_chain(mad_scalar_chain(tag), env)
        if env[f"t12_{tag}"] == 0.0:
            raise ValueError("degenerate CCA target (t12 == 0)")
    scal = {k: v for k, v in env.items() if not isinstance(v, np.ndarray)}
    pxc = mad_pixel_chain(tag)

    def emit(batch: pa.Table, _s=scal, _c=pxc, _t=tag) -> pa.Table:
        e = eval_chain(_c, {**_s, **_pixel_env(batch, x_cols, y_cols)}, vector=True)
        return pa.table(
            {
                "pixel_id": batch["pixel_id"],
                "mad1_q": np.floor(e[f"madlo_{_t}"] * 1e6 + 0.5).astype(
                    np.int64
                ),
                "mad2_q": np.floor(e[f"madhi_{_t}"] * 1e6 + 0.5).astype(
                    np.int64
                ),
                "chi2_q": np.floor(e[f"chi2_{_t}"] * 1e6 + 0.5).astype(
                    np.int64
                ),
            }
        )

    out = ds.map_batches(emit, batch_format="pyarrow", batch_size=batch_size)
    return out, scal


# ---------------------------------------------------------------------------
# general-C IR-MAD (numpy eig on the driver, any band count)
# ---------------------------------------------------------------------------


def mad_fit(
    ds: ray.data.Dataset,
    x_cols: list[str],
    y_cols: list[str],
    max_iter: int = 50,
    epsilon: float = 1e-6,
    batch_size: int = 32768,
) -> tuple[ray.data.Dataset, dict]:
    """General-C IR-MAD mirroring the reference loop structure
    (imgchngmthds.py:983-1046): weighted moments -> _covw blocks ->
    target = inv(S11)S12inv(S22)S21 -> numpy eig, sqrt-eigenvalues
    argsort ascending -> Y vectors inv(S22)S21Vx -> v'Sv = 1
    normalization -> per-pixel variates, chi-square, dof-C weights.
    Convergence break BEFORE the weight update, like the reference
    (so on early break the emitted chi2 uses the PREVIOUS iteration's
    parameters while the variates use the final ones — the reference's
    own output quirk, kept deliberately).  Weights quantized to 2^-24
    for exact, partition-independent reductions."""
    c = len(x_cols)
    assert len(y_cols) == c

    def params_from_moments(m: dict) -> dict:
        n = m["n"]
        sw = m["sw"]
        mx = np.array([m[f"sx{i + 1}"] / sw for i in range(c)])
        my = np.array([m[f"sy{i + 1}"] / sw for i in range(c)])
        nf = n / (n - 1)

        def cov_block(pref, sa, sb, ma, mb):
            out = np.empty((c, c))
            for i in range(c):
                for j in range(c):
                    key = (
                        f"{pref}{min(i, j) + 1}{max(i, j) + 1}"
                        if pref != "c"
                        else f"c{i + 1}{j + 1}"
                    )
                    out[i, j] = (
                        (
                            m[key]
                            - ma[i] * m[f"{sb}{j + 1}"]
                            - mb[j] * m[f"{sa}{i + 1}"]
                            + ma[i] * mb[j] * sw
                        )
                        / sw
                        * nf
                    )
            return out

        s11 = cov_block("qx", "sx", "sx", mx, mx)
        s22 = cov_block("qy", "sy", "sy", my, my)
        s12 = cov_block("c", "sx", "sy", mx, my)
        target = (
            np.linalg.inv(s11) @ s12 @ np.linalg.inv(s22) @ s12.T
        )
        np.nan_to_num(target, copy=False, nan=0.0, posinf=0.0, neginf=0.0)
        eigval, evx = np.linalg.eig(target)
        rho = np.sqrt(eigval.real)
        idx = rho.argsort()
        rho = rho[idx]
        evx = evx.real[:, idx]
        evy = np.linalg.inv(s22) @ s12.T @ evx
        nx = np.sqrt(1 / np.diag(evx.T @ s11 @ evx))
        ny = np.sqrt(1 / np.diag(evy.T @ s22 @ evy))
        evx = nx * evx
        evy = ny * evy
        # deterministic sign: largest-|.| component of each X vector
        # positive (numpy eig sign is arbitrary)
        sg = np.sign(evx[np.abs(evx).argmax(axis=0), np.arange(c)])
        return {
            "mx": mx,
            "my": my,
            "evx": evx * sg,
            "evy": evy * sg,
            "rho": rho,
            "var": 2.0 * (1.0 - rho),
        }

    def weight_fn_from(p: dict):
        def wfn(batch: pa.Table) -> np.ndarray:
            e = _pixel_env(batch, x_cols, y_cols)
            xc = np.stack([e[f"x{i + 1}"] - p["mx"][i] for i in range(c)])
            yc = np.stack([e[f"y{i + 1}"] - p["my"][i] for i in range(c)])
            mad = p["evx"].T @ xc - p["evy"].T @ yc
            chi2 = (mad * mad / p["var"][:, None]).sum(axis=0)
            w = chi2_sf(chi2, c)
            return np.floor(w * 16777216.0 + 0.5).astype(np.int64)

        return wfn

    params = None
    chi2_params = None
    can_corr = np.full(c, 100.0)
    for _ in range(max_iter):
        wfn = None if params is None else weight_fn_from(params)
        m = weighted_cross_moments(ds, x_cols, y_cols, wfn, batch_size)
        if m["sw"] < WEIGHT_SCALE:
            # all quantized weights collapsed to ~0 (rho -> 1 on a
            # static scene): the reweighted covariance is singular.
            # Keep the previous iteration's parameters — they already
            # describe the no-change canonical space.
            break
        new = params_from_moments(m)
        converged = np.max(np.abs(can_corr - new["rho"])) < epsilon
        if converged:
            chi2_params = params if params is not None else new
            params = new
            break
        can_corr = new["rho"]
        params = new
        chi2_params = new

    p, q = params, chi2_params

    def emit(batch: pa.Table) -> pa.Table:
        e = _pixel_env(batch, x_cols, y_cols)
        xc = np.stack([e[f"x{i + 1}"] - p["mx"][i] for i in range(c)])
        yc = np.stack([e[f"y{i + 1}"] - p["my"][i] for i in range(c)])
        mad = p["evx"].T @ xc - p["evy"].T @ yc
        xq = np.stack([e[f"x{i + 1}"] - q["mx"][i] for i in range(c)])
        yq = np.stack([e[f"y{i + 1}"] - q["my"][i] for i in range(c)])
        madq = q["evx"].T @ xq - q["evy"].T @ yq
        chi2 = (madq * madq / q["var"][:, None]).sum(axis=0)
        out = {"pixel_id": batch["pixel_id"]}
        for i in range(c):
            out[f"mad{i + 1}"] = mad[i]
        out["chi2"] = chi2
        return pa.table(out)

    ds_out = ds.map_batches(emit, batch_format="pyarrow", batch_size=batch_size)
    return ds_out, {"rho": p["rho"]}


# ---------------------------------------------------------------------------
# ISFA (slow_feature_analysis, imgchngmthds.py:521) — 3-band mirror
# ---------------------------------------------------------------------------

# Abramowitz & Stegun 7.1.26 erfc for x >= 0 (|err| <= 1.5e-7): the
# dof-3 chi-square weight needs erfc and DuckDB 1.0 has none, so BOTH
# the mirrored engine path and the SQL oracle use this closed form —
# bit-equal to each other, within 1.5e-7 of the exact-erfc general
# path (the parity pytest pins that bound).
_AS_ERFC = (
    "((((1.061405429e0*{t} - 1.453152027e0)*{t} + 1.421413741e0)*{t}"
    " - 0.284496736e0)*{t} + 0.254829592e0)*{t} * EXP(-({x})*({x}))"
)


def sfa_scalar_chain(t: str) -> Chain:
    """Scalar chain for one ISFA iteration over 3+3 bands
    (imgchngmthds.py:683-737): weighted means, the reference's
    (P-1)*sum_w/P denominator, per-band weighted variances and stds,
    mat_A (normalized-difference covariance) and mat_B (mean of the
    two normalized covariances) via the exact-integer expansion,
    M = inv(B) @ A explicitly, the characteristic cubic solved by the
    trigonometric method (three real roots for the symmetric-definite
    pencil), eigenvalues ordered via LEAST/GREATEST, eigenvectors as
    (M - l I) row cross products normalized by max-abs (the
    reference's aux step).  Needs distinct roots and a non-degenerate
    cross product — generic for correlated fixtures; the engine
    asserts ACOS domain."""
    s = lambda nm: f"{nm}_{t}"  # noqa: E731
    ch: Chain = []
    a = ch.append
    for i in (1, 2, 3):
        a((s(f"mx{i}"), f"{s(f'sx{i}')} / {s('sw')}"))
        a((s(f"my{i}"), f"{s(f'sy{i}')} / {s('sw')}"))
    a((s("dd"), f"(n - 1) * {s('sw')} / n"))

    def cm(out, q, su, sv, mu, mv):
        a(
            (
                s(out),
                f"{s(q)} - {s(mu)}*{s(sv)} - {s(mv)}*{s(su)}"
                f" + {s(mu)}*{s(mv)}*{s('sw')}",
            )
        )

    for i in (1, 2, 3):
        for j in (1, 2, 3):
            if j >= i:
                cm(f"sxx{i}{j}", f"qx{i}{j}", f"sx{i}", f"sx{j}", f"mx{i}", f"mx{j}")
                cm(f"syy{i}{j}", f"qy{i}{j}", f"sy{i}", f"sy{j}", f"my{i}", f"my{j}")
            cm(f"sxy{i}{j}", f"c{i}{j}", f"sx{i}", f"sy{j}", f"mx{i}", f"my{j}")
    for i in (1, 2, 3):
        a((s(f"sdx{i}"), f"SQRT({s(f'sxx{i}{i}')} / {s('dd')})"))
        a((s(f"sdy{i}"), f"SQRT({s(f'syy{i}{i}')} / {s('dd')})"))

    def sym(pre, i, j):  # upper-triangle storage of symmetric blocks
        return s(f"{pre}{min(i, j)}{max(i, j)}")

    for i in (1, 2, 3):
        for j in (1, 2, 3):
            if j < i:
                continue
            a(
                (
                    s(f"ma{i}{j}"),
                    f"({sym('sxx', i, j)}/({s(f'sdx{i}')}*{s(f'sdx{j}')})"
                    f" - {s(f'sxy{i}{j}')}/({s(f'sdx{i}')}*{s(f'sdy{j}')})"
                    f" - {s(f'sxy{j}{i}')}/({s(f'sdy{i}')}*{s(f'sdx{j}')})"
                    f" + {sym('syy', i, j)}/({s(f'sdy{i}')}*{s(f'sdy{j}')}))"
                    f" / {s('dd')}",
                )
            )
            a(
                (
                    s(f"mb{i}{j}"),
                    f"({sym('sxx', i, j)}/({s(f'sdx{i}')}*{s(f'sdx{j}')})"
                    f" + {sym('syy', i, j)}/({s(f'sdy{i}')}*{s(f'sdy{j}')}))"
                    f" / (2.0e0 * {s('dd')})",
                )
            )

    def B(i, j):
        return s(f"mb{min(i, j)}{max(i, j)}")

    def A(i, j):
        return s(f"ma{min(i, j)}{max(i, j)}")

    a(
        (
            s("detb"),
            f"{B(1,1)}*({B(2,2)}*{B(3,3)} - {B(2,3)}*{B(2,3)})"
            f" - {B(1,2)}*({B(1,2)}*{B(3,3)} - {B(2,3)}*{B(1,3)})"
            f" + {B(1,3)}*({B(1,2)}*{B(2,3)} - {B(2,2)}*{B(1,3)})",
        )
    )
    # inverse of symmetric B via adjugate (6 unique entries)
    a((s("ib11"), f"({B(2,2)}*{B(3,3)} - {B(2,3)}*{B(2,3)}) / {s('detb')}"))
    a((s("ib12"), f"({B(1,3)}*{B(2,3)} - {B(1,2)}*{B(3,3)}) / {s('detb')}"))
    a((s("ib13"), f"({B(1,2)}*{B(2,3)} - {B(1,3)}*{B(2,2)}) / {s('detb')}"))
    a((s("ib22"), f"({B(1,1)}*{B(3,3)} - {B(1,3)}*{B(1,3)}) / {s('detb')}"))
    a((s("ib23"), f"({B(1,3)}*{B(1,2)} - {B(1,1)}*{B(2,3)}) / {s('detb')}"))
    a((s("ib33"), f"({B(1,1)}*{B(2,2)} - {B(1,2)}*{B(1,2)}) / {s('detb')}"))

    def IB(i, j):
        return s(f"ib{min(i, j)}{max(i, j)}")

    for i in (1, 2, 3):
        for j in (1, 2, 3):
            a(
                (
                    s(f"m{i}{j}"),
                    f"{IB(i,1)}*{A(1,j)} + {IB(i,2)}*{A(2,j)}"
                    f" + {IB(i,3)}*{A(3,j)}",
                )
            )
    M = lambda i, j: s(f"m{i}{j}")  # noqa: E731
    a((s("c2"), f"{M(1,1)} + {M(2,2)} + {M(3,3)}"))
    a(
        (
            s("c1"),
            f"({M(1,1)}*{M(2,2)} - {M(1,2)}*{M(2,1)})"
            f" + ({M(1,1)}*{M(3,3)} - {M(1,3)}*{M(3,1)})"
            f" + ({M(2,2)}*{M(3,3)} - {M(2,3)}*{M(3,2)})",
        )
    )
    a(
        (
            s("c0"),
            f"{M(1,1)}*({M(2,2)}*{M(3,3)} - {M(2,3)}*{M(3,2)})"
            f" - {M(1,2)}*({M(2,1)}*{M(3,3)} - {M(2,3)}*{M(3,1)})"
            f" + {M(1,3)}*({M(2,1)}*{M(3,2)} - {M(2,2)}*{M(3,1)})",
        )
    )
    a((s("pp"), f"{s('c1')} - {s('c2')}*{s('c2')}/3.0e0"))
    a(
        (
            s("qq"),
            f"{s('c1')}*{s('c2')}/3.0e0"
            f" - 2.0e0*{s('c2')}*{s('c2')}*{s('c2')}/27.0e0 - {s('c0')}",
        )
    )
    a((s("rr"), f"SQRT(-({s('pp')})/3.0e0)"))
    a((s("th"), f"ACOS(-({s('qq')}) / (2.0e0*{s('rr')}*{s('rr')}*{s('rr')}))"))
    for k in (0, 1, 2):
        a(
            (
                s(f"lr{k}"),
                f"2.0e0*{s('rr')}*COS({s('th')}/3.0e0"
                f" - 2.0e0*PI()*{k}/3.0e0) + {s('c2')}/3.0e0",
            )
        )
    a((s("l0"), f"LEAST({s('lr0')}, {s('lr1')}, {s('lr2')})"))
    a((s("l2"), f"GREATEST({s('lr0')}, {s('lr1')}, {s('lr2')})"))
    a(
        (
            s("l1"),
            f"{s('lr0')} + {s('lr1')} + {s('lr2')} - {s('l0')} - {s('l2')}",
        )
    )
    for k in (0, 1, 2):
        a((s(f"sq{k}"), f"SQRT({s(f'l{k}')})"))
        lam = s(f"l{k}")
        a(
            (
                s(f"ev{k}1"),
                f"{M(1,2)}*{M(2,3)} - ({M(2,2)} - {lam})*{M(1,3)}",
            )
        )
        a(
            (
                s(f"ev{k}2"),
                f"{M(1,3)}*{M(2,1)} - ({M(1,1)} - {lam})*{M(2,3)}",
            )
        )
        a(
            (
                s(f"ev{k}3"),
                f"({M(1,1)} - {lam})*({M(2,2)} - {lam}) - {M(1,2)}*{M(2,1)}",
            )
        )
        a(
            (
                s(f"aux{k}"),
                f"GREATEST(ABS({s(f'ev{k}1')}), ABS({s(f'ev{k}2')}),"
                f" ABS({s(f'ev{k}3')}))",
            )
        )
        for i in (1, 2, 3):
            a((s(f"w{k}{i}"), f"{s(f'ev{k}{i}')} / {s(f'aux{k}')}"))
    return ch


def sfa_pixel_chain(t: str) -> Chain:
    """Per-pixel ISFA chain: standardized bands, the three slow
    features (ascending-eigenvalue transform columns), the IWD
    T = sum isfa_k^2 / sqrt(lambda_k) (sign-invariant, so the
    eigenvector sign ambiguity never reaches the output), and the
    dof-3 weight 1 - chi2cdf(T,3) = erfc(sqrt(T/2))
    + sqrt(2T/pi) exp(-T/2) with the shared A-S erfc."""
    s = lambda nm: f"{nm}_{t}"  # noqa: E731
    ch: Chain = []
    a = ch.append
    for i in (1, 2, 3):
        a((s(f"nx{i}"), f"(x{i} - {s(f'mx{i}')}) / {s(f'sdx{i}')}"))
        a((s(f"ny{i}"), f"(y{i} - {s(f'my{i}')}) / {s(f'sdy{i}')}"))
        a((s(f"df{i}"), f"{s(f'nx{i}')} - {s(f'ny{i}')}"))
    for k in (0, 1, 2):
        a(
            (
                s(f"isf{k}"),
                f"{s(f'w{k}1')}*{s('df1')} + {s(f'w{k}2')}*{s('df2')}"
                f" + {s(f'w{k}3')}*{s('df3')}",
            )
        )
    a(
        (
            s("tt"),
            f"{s('isf0')}*{s('isf0')}/{s('sq0')}"
            f" + {s('isf1')}*{s('isf1')}/{s('sq1')}"
            f" + {s('isf2')}*{s('isf2')}/{s('sq2')}",
        )
    )
    a((s("xx"), f"SQRT({s('tt')}/2.0e0)"))
    a((s("tp"), f"1.0e0 / (1.0e0 + 0.3275911e0*{s('xx')})"))
    a((s("efc"), _AS_ERFC.format(t=s("tp"), x=s("xx"))))
    a(
        (
            s("w"),
            f"{s('efc')} + SQRT(2.0e0*{s('tt')}/PI())*EXP(-({s('tt')})/2.0e0)",
        )
    )
    return ch


def sfa_fit_3band(
    ds: ray.data.Dataset,
    x_cols: list[str],
    y_cols: list[str],
    n_iters: int = 2,
    batch_size: int = 32768,
) -> tuple[ray.data.Dataset, dict]:
    """Mirrored 3-band ISFA: exactly ``n_iters`` reweighted
    iterations (one zero-shuffle moments pass each), per-pixel output
    (T, sqrt(T)) from the final transform — the reference's change
    distance surface before its Otsu binarization (covered by the
    existing threshold machinery)."""
    assert len(x_cols) == 3 and len(y_cols) == 3
    env: dict = {}
    tag = ""
    for it in range(n_iters):
        tag = chr(ord("a") + it)
        if it == 0:
            wfn = None
        else:
            prev = chr(ord("a") + it - 1)
            scal = {
                k: v for k, v in env.items() if not isinstance(v, np.ndarray)
            }
            pxc = sfa_pixel_chain(prev)

            def wfn(batch, _s=scal, _c=pxc, _p=prev):
                e = eval_chain(
                    _c, {**_s, **_pixel_env(batch, x_cols, y_cols)}, vector=True
                )
                return np.floor(e[f"w_{_p}"] * 16777216.0 + 0.5).astype(
                    np.int64
                )

        m = weighted_cross_moments(ds, x_cols, y_cols, wfn, batch_size)
        env["n"] = m["n"]
        for k, v in m.items():
            if k != "n":
                env[f"{k}_{tag}"] = v
        env = eval_chain(sfa_scalar_chain(tag), env)
        if not (-1.0 <= -env[f"qq_{tag}"] / (2.0 * env[f"rr_{tag}"] ** 3) <= 1.0):
            raise ValueError("degenerate cubic (repeated eigenvalues)")
    scal = {k: v for k, v in env.items() if not isinstance(v, np.ndarray)}
    pxc = sfa_pixel_chain(tag)

    def emit(batch: pa.Table, _s=scal, _c=pxc, _t=tag) -> pa.Table:
        e = eval_chain(
            _c, {**_s, **_pixel_env(batch, x_cols, y_cols)}, vector=True
        )
        tt = e[f"tt_{_t}"]
        return pa.table(
            {
                "pixel_id": batch["pixel_id"],
                "t_q": np.floor(tt * 1e6 + 0.5).astype(np.int64),
                "sqrt_q": np.floor(np.sqrt(tt) * 1e6 + 0.5).astype(np.int64),
            }
        )

    out = ds.map_batches(emit, batch_format="pyarrow", batch_size=batch_size)
    return out, scal


def isfa_fit(
    ds: ray.data.Dataset,
    x_cols: list[str],
    y_cols: list[str],
    max_iter: int = 50,
    epsilon: float = 1e-6,
    regular: bool = False,
    norm_trans: bool = False,
    batch_size: int = 32768,
) -> tuple[ray.data.Dataset, dict]:
    """General-C ISFA mirroring the reference loop
    (imgchngmthds.py:683-775): weighted moments -> standardized
    difference covariance mat_A and mean covariance mat_B (optional
    Laplacian-penalty regularization) -> generalized eig (via
    eig(solve(B, A))), eigenvalues ascending, eigenvectors max-abs
    normalized -> IWD T = sum isfa^2 / sqrt(lambda) -> dof-C
    chi-square weights.  Convergence break on
    max|sqrt(lamb) - sqrt(eig)| < epsilon BEFORE the transform
    update, like the reference (output T then comes from the last
    executed update).  Weights quantized to 2^-24 for exact
    reductions."""
    c = len(x_cols)
    assert len(y_cols) == c
    arr_l = np.zeros((c - 2, c))
    for i in range(c - 2):
        arr_l[i, i] = 1
        arr_l[i, i + 1] = -2
        arr_l[i, i + 2] = 1
    omega = arr_l.T @ arr_l

    def state_from_moments(m: dict) -> dict:
        n, sw = m["n"], m["sw"]
        mx = np.array([m[f"sx{i + 1}"] / sw for i in range(c)])
        my = np.array([m[f"sy{i + 1}"] / sw for i in range(c)])
        dd = (n - 1) * sw / n
        sxx = np.empty((c, c))
        syy = np.empty((c, c))
        sxy = np.empty((c, c))
        for i in range(c):
            for j in range(c):
                kq = f"{min(i, j) + 1}{max(i, j) + 1}"
                sxx[i, j] = (
                    m[f"qx{kq}"]
                    - mx[i] * m[f"sx{j + 1}"]
                    - mx[j] * m[f"sx{i + 1}"]
                    + mx[i] * mx[j] * sw
                )
                syy[i, j] = (
                    m[f"qy{kq}"]
                    - my[i] * m[f"sy{j + 1}"]
                    - my[j] * m[f"sy{i + 1}"]
                    + my[i] * my[j] * sw
                )
                sxy[i, j] = (
                    m[f"c{i + 1}{j + 1}"]
                    - mx[i] * m[f"sy{j + 1}"]
                    - my[j] * m[f"sx{i + 1}"]
                    + mx[i] * my[j] * sw
                )
        sdx = np.sqrt(np.diag(sxx) / dd)
        sdy = np.sqrt(np.diag(syy) / dd)
        ox = np.outer(sdx, sdx)
        oy = np.outer(sdy, sdy)
        oxy = np.outer(sdx, sdy)
        mat_a = (sxx / ox - sxy / oxy - sxy.T / oxy.T + syy / oy) / dd
        mat_b = (sxx / ox + syy / oy) / (2 * dd)
        if regular:
            mat_b = mat_b + (np.trace(mat_b) / np.trace(omega)) * omega
        eigval, eigvec = np.linalg.eig(np.linalg.solve(mat_b, mat_a))
        eigval = eigval.real
        idx = eigval.argsort()
        eigval = eigval[idx]
        eigvec = eigvec.real
        aux = np.abs(eigvec).max(axis=0)
        eigvec = eigvec / aux
        trans = eigvec[:, idx]
        if norm_trans:
            trans = trans * (
                1.0 / np.sqrt(np.diag(trans.T @ mat_b @ trans))
            )
        return {
            "mx": mx,
            "my": my,
            "sdx": sdx,
            "sdy": sdy,
            "trans": trans,
            "lamb": eigval,
        }

    def weight_fn_from(st: dict):
        def wfn(batch: pa.Table) -> np.ndarray:
            e = _pixel_env(batch, x_cols, y_cols)
            nx = np.stack(
                [(e[f"x{i + 1}"] - st["mx"][i]) / st["sdx"][i] for i in range(c)]
            )
            ny = np.stack(
                [(e[f"y{i + 1}"] - st["my"][i]) / st["sdy"][i] for i in range(c)]
            )
            isfa = st["trans"].T @ (nx - ny)
            tt = (isfa * isfa / np.sqrt(st["lamb"])[:, None]).sum(axis=0)
            w = chi2_sf(tt, c)
            return np.floor(w * 16777216.0 + 0.5).astype(np.int64)

        return wfn

    state = None
    lamb = np.full(c, 100.0)
    for _ in range(max_iter):
        wfn = None if state is None else weight_fn_from(state)
        m = weighted_cross_moments(ds, x_cols, y_cols, wfn, batch_size)
        if m["sw"] < WEIGHT_SCALE:
            break
        new = state_from_moments(m)
        if np.max(np.abs(np.sqrt(lamb) - np.sqrt(new["lamb"]))) < epsilon:
            break
        lamb = new["lamb"]
        state = new

    st = state

    def emit(batch: pa.Table) -> pa.Table:
        e = _pixel_env(batch, x_cols, y_cols)
        nx = np.stack(
            [(e[f"x{i + 1}"] - st["mx"][i]) / st["sdx"][i] for i in range(c)]
        )
        ny = np.stack(
            [(e[f"y{i + 1}"] - st["my"][i]) / st["sdy"][i] for i in range(c)]
        )
        isfa = st["trans"].T @ (nx - ny)
        tt = (isfa * isfa / np.sqrt(st["lamb"])[:, None]).sum(axis=0)
        out = {"pixel_id": batch["pixel_id"]}
        for k in range(c):
            out[f"isfa{k + 1}"] = isfa[k]
        out["t_chi2"] = tt
        out["sqrt_chi2"] = np.sqrt(tt)
        return pa.table(out)

    ds_out = ds.map_batches(emit, batch_format="pyarrow", batch_size=batch_size)
    return ds_out, {"lamb": st["lamb"]}


def pyod_knn_outliers(
    ds,
    id_col: str,
    feat_cols: list[str],
    k: int = 5,
    cont_num: int = 1,
    cont_den: int = 10,
    batch_size: int = 4096,
):
    """find_class_pyod_outliers (changedetect/pxloutlierchng.py:57)
    instantiated with the pyod KNN detector (pyod.models.knn.KNN,
    method='largest', the library default) — the deterministic member
    of the wrapped estimator zoo, from scratch:

    - FIT on the in-mask pixel matrix: decision score = distance to
      the k-th nearest neighbour, SELF EXCLUDED (sklearn
      ``kneighbors()`` with X=None); since self is always the
      0-distance minimum, the self-excluded k-th equals the
      self-INCLUDED (k+1)-th — one distance pass serves both.
    - THRESHOLD = the (1 - contamination) percentile of the fit
      scores.  Pinned substitutions: squared distances replace
      Euclidean (the percentile interpolation happens on the squared
      scale, keeping the whole chain exact-rational over int
      features; labels can differ from the sqrt-scale reference only
      on the measure-zero boundary family), and numpy's float
      ``percentile`` interpolation becomes the exact rational
      ``thr*den*10 ~ s[j]*(10-r) + s[j+1]*r`` with
      j = ((m-1)*9)//10, r = ((m-1)*9)%10 for contamination 1/10.
    - PREDICT over the same in-mask pixels (the reference classifies
      the masked image region, which contains the training pixels):
      score = k-th nearest INCLUDING the identical training point
      (sklearn ``kneighbors(X)`` does not exclude); outlier iff
      10*score > thr10; labels 2 (outlier) / 1, the reference's
      output coding.

    Physical plan: the in-mask feature matrix is broadcast (training
    contract), scoring streams per batch (exact int64 matmul +
    ``np.partition`` order statistics), only the tiny per-pixel fit
    scores return to the driver for the threshold, and labels attach
    in a second streaming pass."""
    import ray as _ray

    mt = ds.select_columns([id_col] + feat_cols).to_pandas()
    mt = mt.sort_values(id_col)
    ids = mt[id_col].to_numpy().astype(np.int64)
    X = np.stack(
        [mt[c].to_numpy().astype(np.int64) for c in feat_cols], axis=1
    )
    xref = _ray.put((ids, X))

    def score(batch: pa.Table) -> pa.Table:
        aids, aX = _ray.get(xref)
        bids = batch[id_col].to_numpy().astype(np.int64)
        pos = np.searchsorted(aids, bids)
        bX = aX[pos]
        aa = (bX * bX).sum(axis=1)[:, None]
        bb = (aX * aX).sum(axis=1)[None, :]
        d2 = aa + bb - 2 * (bX @ aX.T)
        part = np.partition(d2, k, axis=1)
        kth_pred = np.partition(part[:, : k + 1], k - 1, axis=1)[
            :, k - 1
        ]
        kth_fit = part[:, k]
        return pa.table(
            {
                id_col: bids,
                "score": kth_pred.astype(np.int64),
                "score_fit": kth_fit.astype(np.int64),
            }
        )

    scored = ds.map_batches(
        score, batch_format="pyarrow", batch_size=batch_size
    ).materialize()
    s = np.sort(
        pa.concat_tables(_ray.get(scored.to_arrow_refs()))[
            "score_fit"
        ].to_numpy()
    )
    m = len(s)
    assert cont_num * 10 == cont_den, "pinned for contamination 1/10"
    j = ((m - 1) * 9) // 10
    r = ((m - 1) * 9) % 10
    thr10 = int(s[j]) * (10 - r) + int(s[min(j + 1, m - 1)]) * r
    tref = _ray.put(thr10)

    def label(batch: pa.Table) -> pa.Table:
        t10 = _ray.get(tref)
        sc = batch["score"].to_numpy()
        lab = np.where(10 * sc > t10, 2, 1).astype(np.int64)
        return pa.table(
            {
                id_col: batch[id_col],
                "score": sc,
                "label": lab,
            }
        )

    return scored.map_batches(label, batch_format="pyarrow")
