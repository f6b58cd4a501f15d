"""Row-wise kernels across a small fixed set of value columns — the
multi-image pixel aggregates family (``calc_imgs_pxl_mode``
/root/reference/python/rsgislib/imagecalc/__init__.py:1100,
``calc_imgs_pxl_percentiles`` :1161, ``get_img_idx_for_stat``
/root/reference/python/src/imagecalc.cpp:2331). k (number of
"images") is small; rows are many — everything is vectorized over
rows."""

from __future__ import annotations

import numpy as np


def row_mode_min(cols: list[np.ndarray]) -> np.ndarray:
    """Per-row modal value across columns; ties -> SMALLEST value
    (scipy.stats.mstats.mode tie rule the reference inherits,
    zonalstats/__init__.py:466-470)."""
    m = np.sort(np.stack(cols, axis=1), axis=1)  # sorted rows
    n, k = m.shape
    best_val = m[:, 0].copy()
    best_cnt = np.ones(n, dtype=np.int64)
    run_val = m[:, 0].copy()
    run_cnt = np.ones(n, dtype=np.int64)
    for j in range(1, k):
        same = m[:, j] == run_val
        run_cnt = np.where(same, run_cnt + 1, 1)
        run_val = m[:, j]
        better = run_cnt > best_cnt  # strict: keeps the SMALLEST on ties
        best_cnt = np.where(better, run_cnt, best_cnt)
        best_val = np.where(better, run_val, best_val)
    return best_val


def row_argmin_first(cols: list[np.ndarray]) -> np.ndarray:
    """Per-row 1-based index of the minimum; first column wins ties
    (get_img_idx_for_stat semantics)."""
    m = np.stack(cols, axis=1)
    return m.argmin(axis=1).astype(np.int64) + 1


def row_percentile(cols: list[np.ndarray], q: float) -> np.ndarray:
    """Per-row linear-interpolation percentile (numpy default)."""
    m = np.stack(cols, axis=1).astype(np.float64)
    return np.percentile(m, q, axis=1)


def get_bin_centres(
    bin_edges: np.ndarray, geometric: bool = False
) -> np.ndarray:
    """Histogram bin centres from bin edges (tools/stats.py:626):
    arithmetic (max+min)/2 by default, geometric sqrt(min*max) for
    logarithmically spaced bins."""
    if geometric:
        return np.sqrt(bin_edges[1:] * bin_edges[:-1])
    return (bin_edges[1:] + bin_edges[:-1]) / 2
