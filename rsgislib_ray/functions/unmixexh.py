"""Exhaustive constrained linear spectral unmixing.

Mirrors reference src/img/RSGISLinearSpectralUnmixing.cpp:36-210
(``exhcon_linear_spec_unmix``, python/src/imagecalc.cpp binding):
a brute-force grid search over endmember abundance combinations,
scored by float32 RMS distance between the generated spectrum and the
UNIT-NORMALISED pixel spectrum.

Float-precision contract (every op mirrored by the SQL oracle):

- Endmember columns are normalised by ``normalisedColumnsMatrix``
  (RSGISMatrices.cpp:991): the squared-element sum ACCUMULATES IN
  FLOAT32 (``float normalisingVals[] += double product`` rounds each
  step), sqrt back to float32, then each stored element is the raw
  DOUBLE divided by that float32 norm.
- Per pixel: sqSum accumulates in double but each addend is the
  FLOAT32 product v*v; normVal = float32(sqrt(sqSum)); the
  normalised pixel bands are float32 divisions.
- numOfSteps = (1/stepRes)+1 evaluated in float32 then truncated;
  abundance values advance by REPEATED float32 addition of stepRes
  (exact for dyadic steps); a combination is scored only when
  em1+em2(+em3) < threshold = 1+stepRes (float32).
- Distance (calcDistance2MeasuredSpectra:~260): per band
  gen = float32(E0*em1 + E1*em2) (double chain rounded at the float
  assignment); diff/square/accumulate all float32; rmse =
  float32(sqrt(err/numBands)).
- The winner is the FIRST strict minimum in scan order (em1 outer,
  em2 inner) — ties keep the earlier combination.
- All-zero pixels (normVal == 0) skip the search and output zeros.
- Outputs are offset + value*gain (defaults 1/0).
"""

from __future__ import annotations

import math

import numpy as np

F = np.float32


def normalise_columns_f32(raw: np.ndarray) -> np.ndarray:
    """normalisedColumnsMatrix (RSGISMatrices.cpp:991): float32 norm
    accumulation, double element / float32 norm. ``raw`` is
    (n_bands, n_endmembers) double; returns double."""
    n_bands, n_em = raw.shape
    out = np.zeros_like(raw, dtype=np.float64)
    for i in range(n_em):
        norm = F(0.0)
        for j in range(n_bands):
            norm = F(norm + raw[j, i] * raw[j, i])
        norm = F(math.sqrt(norm))
        for j in range(n_bands):
            out[j, i] = raw[j, i] / float(norm)
    return out


def _dist2(em1: F, em2: F, norm_px: np.ndarray, emn: np.ndarray) -> F:
    n_bands = len(norm_px)
    err = F(0.0)
    for i in range(n_bands):
        gen = F(emn[i, 0] * float(em1) + emn[i, 1] * float(em2))
        diff = F(gen - norm_px[i])
        err = F(err + F(diff * diff))
    return F(math.sqrt(float(F(err / F(n_bands)))))


def exhcon_unmix_pixel(
    band_vals: np.ndarray,
    emn: np.ndarray,
    step_res: float = 0.25,
    gain: float = 1.0,
    offset: float = 0.0,
):
    """One pixel through the 2-endmember exhaustive search
    (RSGISLinearSpectralUnmixing.cpp:99-210). ``band_vals`` float32,
    ``emn`` the column-normalised endmember matrix."""
    step = F(step_res)
    num_steps = int(F(1) / step + F(1))
    threshold = F(F(1) + step)
    sq_sum = 0.0
    for v in band_vals:
        sq_sum += float(F(v * v))
    norm_val = F(math.sqrt(sq_sum))
    first = True
    min_err = F(0.0)
    min_e1 = F(0.0)
    min_e2 = F(0.0)
    if norm_val > 0:
        norm_px = np.array(
            [F(v / norm_val) for v in band_vals], dtype=np.float32
        )
        em1 = F(0.0)
        for _ in range(num_steps):
            em2 = F(0.0)
            for _ in range(num_steps):
                if F(em1 + em2) < threshold:
                    dist = _dist2(em1, em2, norm_px, emn)
                    if first:
                        min_err, min_e1, min_e2 = dist, em1, em2
                        first = False
                    elif dist < min_err:
                        min_err, min_e1, min_e2 = dist, em1, em2
                em2 = F(em2 + step)
            em1 = F(em1 + step)
    if not first:
        return (
            offset + float(min_e1) * gain,
            offset + float(min_e2) * gain,
            offset + float(min_err) * gain,
        )
    return 0.0, 0.0, 0.0
