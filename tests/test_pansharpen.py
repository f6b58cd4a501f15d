"""hcs_pan_sharpen vs a literal scalar transcription of
RSGISPanSharpen.cpp (naive :37 / smart :94 calcImageValue, stats
:185/:219), float32 locals throughout."""

import math

import numpy as np
import pyarrow as pa
import pytest
import ray

F = np.float32


def _stats_brute(bands, pan):
    n = 0
    s_ms = s_pan = 0
    xs_ms, xs_pan = [], []
    for r in range(bands[0].shape[0]):
        for c in range(bands[0].shape[1]):
            if bands[0][r, c] > 0:
                n += 1
                msq = sum(int(b[r, c]) ** 2 for b in bands)
                p2 = int(pan[r, c]) ** 2
                s_ms += msq
                s_pan += p2
                xs_ms.append(msq)
                xs_pan.append(p2)
    mean_ms = F(s_ms / n)
    mean_pan = F(s_pan / n)
    # the engine's pinned moment identity with the float32 mean
    var_ms = (
        sum(x * x for x in xs_ms)
        - 2.0 * float(mean_ms) * s_ms
        + n * float(mean_ms) ** 2
    ) / n
    var_pan = (
        sum(x * x for x in xs_pan)
        - 2.0 * float(mean_pan) * s_pan
        + n * float(mean_pan) ** 2
    ) / n
    return (
        float(mean_ms), float(mean_pan),
        float(F(math.sqrt(var_ms))), float(F(math.sqrt(var_pan))),
    )


def _apply_brute(bands, pan, stats, win=7):
    mean_ms, mean_pan, sd_ms, sd_pan = (F(s) for s in stats)
    nb = len(bands)
    n_rows, n_cols = bands[0].shape
    half = win // 2
    outs = {
        f"b{i}_{m}": np.zeros((n_rows, n_cols))
        for i in range(nb) for m in ("naive", "smart")
    }

    def p_sq(p):
        t = F(p * p)
        t = F(t - mean_pan)
        t = F(t + sd_pan)
        t = F(F(sd_ms / sd_pan) * t)
        return F(t + F(mean_ms - sd_ms))

    for r in range(n_rows):
        for c in range(n_cols):
            ms = [F(b[r, c]) for b in bands]
            p = F(pan[r, c])
            # phi (float32 locals; MS_i included in its own numerator)
            phi = []
            for i in range(nb - 1):
                acc = F(0.0)
                for j in range(i, nb):
                    acc = F(acc + F(ms[j] * ms[j]))
                with np.errstate(divide="ignore", invalid="ignore"):
                    root = F(np.sqrt(np.float64(acc)))
                    ratio = F(np.float64(root) / np.float64(ms[i]))
                    phi.append(F(np.arctan(np.float64(ratio))))
            psq = p_sq(p)
            ia_n = F(np.sqrt(np.float64(psq)))
            if psq < 0:
                ia_n = F(0.0)
            # smart
            s = 0.0
            for dr in range(-half, half + 1):
                for dc in range(-half, half + 1):
                    rr, cc = r + dr, c + dc
                    if 0 <= rr < n_rows and 0 <= cc < n_cols:
                        s += float(pan[rr, cc])
            pan_smooth = F(F(s) / F(win * win))
            psq_s = p_sq(pan_smooth)
            i_sq = F(0.0)
            for i in range(nb - 1):  # last MS band skipped
                i_sq = F(i_sq + F(ms[i] * ms[i]))
            with np.errstate(divide="ignore", invalid="ignore"):
                ratio = F(np.float64(psq) / np.float64(psq_s))
                arg = F(ratio * i_sq)
                ia_s = F(np.sqrt(np.float64(arg)))
            for name, ia in (("naive", ia_n), ("smart", ia_s)):
                for i in range(nb):
                    prod = F(1.0)
                    for j in range(i if i < nb - 1 else nb - 1):
                        prod = F(
                            np.float64(prod)
                            * np.sin(np.float64(phi[j]))
                        )
                    if i < nb - 1:
                        prod = F(
                            np.float64(prod)
                            * np.cos(np.float64(phi[i]))
                        )
                    outs[f"b{i}_{name}"][r, c] = float(
                        F(np.float64(ia) * np.float64(prod))
                    )
    return outs


@pytest.mark.parametrize("tile_size", [16, 32])
def test_hcs_vs_brute(ray_session, tile_size):
    from rsgislib_ray.stages.pansharpen import hcs_pan_sharpen, hcs_stats

    rng = np.random.RandomState(3)
    n = 36
    m1 = rng.randint(0, 120, size=(n, n)).astype(np.int64)  # zeros gate
    m2 = rng.randint(10, 130, size=(n, n)).astype(np.int64)
    m3 = rng.randint(5, 110, size=(n, n)).astype(np.int64)
    pan = rng.randint(1, 220, size=(n, n)).astype(np.int64)
    pid = np.arange(n * n, dtype=np.int64)
    rr, cc = np.divmod(pid, n)
    tbl = pa.table(
        {"pixel_id": pid, "row": rr, "col": cc,
         "m1": m1.reshape(-1), "m2": m2.reshape(-1),
         "m3": m3.reshape(-1), "pan": pan.reshape(-1)}
    )
    ds = ray.data.from_arrow(tbl).repartition(4)
    stats = hcs_stats(ds, ["m1", "m2", "m3"], "pan")
    exp_stats = _stats_brute([m1, m2, m3], pan)
    assert stats == exp_stats

    got = (
        hcs_pan_sharpen(ds, ["m1", "m2", "m3"], "pan", stats,
                        win_size=7, tile_size=tile_size)
        .to_pandas().sort_values("pixel_id").reset_index(drop=True)
    )
    exp = _apply_brute([m1, m2, m3], pan, stats)
    for i, col in enumerate(("m1", "m2", "m3")):
        for mode in ("naive", "smart"):
            gv = got[f"{col}_{mode}"].to_numpy()
            ev = exp[f"b{i}_{mode}"].reshape(-1)
            both_nan = np.isnan(gv) & np.isnan(ev)
            np.testing.assert_array_equal(
                gv[~both_nan], ev[~both_nan],
                err_msg=f"{col}_{mode} tile={tile_size}",
            )
    # (the pSq<0 -> iAdj=0 branch is exercised by the query fixture,
    # where the oracle replays it bit-exactly)
