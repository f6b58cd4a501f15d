"""sharpen_low_res_bands vs a literal scalar transcription of the C++
(RSGISSharpenLowResImagery.cpp:82 calcImageValue + RSGISMathsUtils.cpp
:1423 performLinearFit / :1493 predFromLinearFit), including the
zero-filled window edges (RSGISCalcImage.cpp:8650-8699) and the
whole-image nodata-included clamps (RSGISCmdImageUtils.cpp:2230)."""

import math

import numpy as np
import pyarrow as pa
import pytest
import ray


def _scalar_linear_fit(xs, ys, nodata):
    """performLinearFit transcription: ordered scalar accumulation."""
    sumx = sumy = sumxsqr = sumxy = 0.0
    n = 0.0
    for x, y in zip(xs, ys):
        if not (x == nodata or y == nodata):
            sumx += x
            sumxsqr += x * x
            sumy += y
            sumxy += x * y
            n += 1
    if n < 3:
        return 0.0, 0.0, 0.0
    pvar = n * sumxsqr - sumx * sumx
    intercept = (sumy * sumxsqr - sumx * sumxy) / pvar
    slope = (n * sumxy - sumx * sumy) / pvar
    ybar = sumy / n
    sumyest = sumyact = 0.0
    for x, y in zip(xs, ys):
        if not (x == nodata or y == nodata):
            sumyest += (slope * x + intercept - ybar) * (
                slope * x + intercept - ybar
            )
            sumyact += (y - ybar) * (y - ybar)
    coeff = math.sqrt(sumyest / sumyact) if sumyact != 0.0 else (
        0.0 if sumyest == 0.0 else math.inf
    )
    if math.isnan(coeff):
        coeff = 0.0
    return slope, intercept, coeff


def _scalar_pred(val, slope, intercept, mn, mx):
    """predFromLinearFit transcription (val==0 quirk, clamp order)."""
    if val == 0:
        return 0.0
    out = slope * val + intercept
    if out < mn:
        return mn
    if out > mx:
        return mx
    return out


def _brute(bands, status, nodata, lo_mm, win=7):
    """Scalar per-pixel window scan with zero-filled edges."""
    names = [c for c, _ in status]
    n_rows, n_cols = bands[names[0]].shape
    half = win // 2
    out = {c: np.zeros((n_rows, n_cols)) for c in names}
    coeffs = {c: np.zeros((n_rows, n_cols))
              for c, s in status if s == "low"}
    highs = [c for c, s in status if s == "high"]
    for r in range(n_rows):
        for c in range(n_cols):
            if all(int(bands[b][r, c]) == nodata for b in names):
                for b in names:
                    out[b][r, c] = nodata
                continue
            wins = {}
            for b in names:
                vals = []
                for dr in range(-half, half + 1):
                    for dc in range(-half, half + 1):
                        rr, cc = r + dr, c + dc
                        if 0 <= rr < n_rows and 0 <= cc < n_cols:
                            vals.append(float(bands[b][rr, cc]))
                        else:
                            vals.append(0.0)  # zero-filled edge
                wins[b] = vals
            for b, s in status:
                if s in ("high", "ignore"):
                    out[b][r, c] = bands[b][r, c]
                    continue
                fits = [
                    _scalar_linear_fit(wins[hb], wins[b], nodata)
                    for hb in highs
                ]
                best, max_coeff = 0, fits[0][2]
                for j in range(1, len(fits)):
                    if fits[j][2] > max_coeff:
                        best, max_coeff = j, fits[j][2]
                coeffs[b][r, c] = max_coeff
                if max_coeff > 0.5:
                    sl, ic, _ = fits[best]
                    out[b][r, c] = _scalar_pred(
                        float(bands[highs[best]][r, c]), sl, ic,
                        lo_mm[b][0], lo_mm[b][1],
                    )
                else:
                    out[b][r, c] = bands[b][r, c]
    return out, coeffs


def _run_stage(bands, status, nodata, lo_mm, tile_size):
    from rsgislib_ray.stages.sharpen import sharpen_low_res_bands

    names = [c for c, _ in status]
    n_rows, n_cols = bands[names[0]].shape
    pid = np.arange(n_rows * n_cols, dtype=np.int64)
    rr, cc = np.divmod(pid, n_cols)
    tbl = pa.table(
        {"pixel_id": pid, "row": rr, "col": cc,
         **{b: bands[b].reshape(-1).astype(np.int64) for b in names}}
    )
    ds = ray.data.from_arrow(tbl).repartition(4)
    out = sharpen_low_res_bands(
        ds, band_status=status, low_min_max=lo_mm,
        win_size=7, no_data_val=nodata, tile_size=tile_size,
    ).to_pandas().sort_values("pixel_id")
    return out


@pytest.mark.parametrize("tile_size", [16, 32])
def test_sharpen_vs_brute(ray_session, tile_size):
    rng = np.random.RandomState(7)
    n = 40
    h1 = rng.randint(1, 120, size=(n, n)).astype(np.int64)
    h2 = rng.randint(1, 120, size=(n, n)).astype(np.int64)
    # low band correlated with h1 left / h2 right + noise strip
    lo = np.where(
        np.arange(n)[None, :] < n // 2, 2 * h1 + 3, 3 * h2 - 5
    ).astype(np.int64)
    lo[:5, :] = rng.randint(1, 300, size=(5, n))
    ig = rng.randint(1, 50, size=(n, n)).astype(np.int64)
    # scattered nodata + an all-zero block
    for b in (h1, h2, lo):
        m = rng.rand(n, n) < 0.06
        b[m] = 0
    for b in (h1, h2, lo, ig):
        b[20:24, 20:24] = 0
    bands = {"ig": ig, "h1": h1, "h2": h2, "lo": lo}
    status = [("ig", "ignore"), ("h1", "high"),
              ("h2", "high"), ("lo", "low")]
    lo_mm = {"lo": (float(lo.min()), float(lo.max()))}

    exp, exp_coeff = _brute(bands, status, 0, lo_mm)
    got = _run_stage(bands, status, 0, lo_mm, tile_size)

    for b in ("ig", "h1", "h2", "lo"):
        np.testing.assert_array_equal(
            got[b].to_numpy(), exp[b].reshape(-1),
            err_msg=f"band {b} tile={tile_size}",
        )
    np.testing.assert_array_equal(
        got["lo_coeff"].to_numpy(), exp_coeff["lo"].reshape(-1)
    )
    # branch coverage: all paths exercised by the fixture
    flat_lo = exp["lo"].reshape(-1)
    assert (flat_lo == 0).any()                       # nodata/val==0
    assert (exp_coeff["lo"].reshape(-1) <= 0.5).any()  # passthrough
    assert (exp_coeff["lo"].reshape(-1) > 0.5).any()   # sharpened


def test_sharpen_clamps_and_val0(ray_session):
    """Engineered windows hitting the min/max clamps and the
    predFromLinearFit val==0 early return."""
    n = 14
    h1 = np.fromfunction(
        lambda r, c: (r * 2 + c) % 23 + 5, (n, n)
    ).astype(np.int64)
    lo = (4 * h1 - 10).astype(np.int64)  # strong fit, wide range
    ig = np.ones((n, n), dtype=np.int64)
    # centre zeros in the high band: val==0 -> 0.0 even though fits
    # around it are strong
    h1[7, 7] = 0
    bands = {"ig": ig, "h1": h1, "lo": lo}
    status = [("ig", "ignore"), ("h1", "high"), ("lo", "low")]
    # artificially tight accepted range to force both clamps
    lo_mm = {"lo": (20.0, 40.0)}
    exp, _ = _brute(bands, status, 0, lo_mm)
    got = _run_stage(bands, status, 0, lo_mm, 16)
    np.testing.assert_array_equal(
        got["lo"].to_numpy(), exp["lo"].reshape(-1)
    )
    vals = got["lo"].to_numpy()
    assert (vals == 20.0).any() and (vals == 40.0).any()  # clamps hit
    assert vals[7 * n + 7] == 0.0                        # val==0 quirk
