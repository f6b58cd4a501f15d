"""Grayscale morphology kernels: dilate / erode / opening / closing /
top-hats / gradient / local minima, plus the circular structuring
element.

Mirrors the reference's imagemorphology surface
(python/src/imagemorphology.cpp bindings over
src/filtering/RSGISMorphology*.cpp and
src/cmds/RSGISCmdImageMorphology.cpp), written from scratch as dense
numpy window reductions. The distributed halo-tiled scale path is
``stages/raster.tiled_filter(agg="max"/"min")`` (queries morph_dilate
/ morph_erode); these kernels pin the EXACT reference semantics the
composed operators need:

- **Out-of-image window cells are ZERO-FILLED**, not truncated
  (RSGISCalcImage::calcImageWindowData, RSGISCalcImage.cpp:8655-8700
  sets ``inDataBlock = 0`` beyond every edge) — so an erosion at the
  border of a positive image pulls to 0 and a dilation of a negative
  image pulls up to 0.
- The structuring element is any 0/1 square matrix; cells compare
  only where ``matrix > 0`` (RSGISMorphologyDilate.cpp:60-120).
  ``make_circular_op`` replicates makeCircularBinaryMatrix
  (RSGISMatrices.cpp:1109): cell = 1 iff dx^2+dy^2 <= (r+0.25)^2.
- Opening iterates erode->dilate; closing dilate->erode; iteration
  i>0 re-reads the PREVIOUS iteration's output
  (RSGISMorphologyOpening.cpp:66-77), i.e. niters chains the whole
  operator, each pass zero-filled independently.
- White top-hat = input - opening; black top-hat = closing - input
  (RSGISMorphologyImageDiff stacks first-minus-second,
  RSGISMorphologyTopHat.cpp:180).
- Gradient = window max - window min in ONE pass
  (RSGISMorphologyGradient.cpp:85) — pointwise equal to
  dilate - erode under the same zero-fill.
- **Local-minima center exclusion is the reference's bitwise-&
  quirk**: the test ``(i != cPxlIdx) & (j != cPxlIdx)``
  (RSGISMorphologyFindExtrema.cpp:113) skips the whole center ROW
  and COLUMN, so in a 3x3 window only the four CORNER cells are
  compared (zero-filled corners included).  ``allow_equal=True``
  disqualifies on strictly-smaller corners, False on <=.
  Binary output is 1/0; ``sequencial`` output numbers the minima by
  the row-major scan order (a running counter in the reference; the
  rank over (row, col) here).
"""

from __future__ import annotations

import numpy as np


def make_circular_op(op_size: int) -> np.ndarray:
    """makeCircularBinaryMatrix (RSGISMatrices.cpp:1109)."""
    if op_size % 2 == 0:
        raise ValueError("Matrix size must be odd.")
    r = (op_size - 1) // 2
    yy, xx = np.meshgrid(
        np.arange(-r, r + 1), np.arange(-r, r + 1), indexing="ij"
    )
    radius_sq = (r + 0.25) * (r + 0.25)
    return (xx * xx + yy * yy <= radius_sq).astype(np.float64)


def _window_reduce(img: np.ndarray, op: np.ndarray, mode: str) -> np.ndarray:
    """Window max/min over SE-selected cells with ZERO edge fill."""
    k = op.shape[0]
    half = k // 2
    h, w = img.shape
    padded = np.zeros((h + 2 * half, w + 2 * half), dtype=np.float64)
    padded[half : half + h, half : half + w] = img
    fill = -np.inf if mode == "max" else np.inf
    red = np.maximum if mode == "max" else np.minimum
    out = np.full((h, w), fill)
    for i in range(k):
        for j in range(k):
            if op[i, j] > 0:
                out = red(out, padded[i : i + h, j : j + w])
    return out


def dilate(img: np.ndarray, op: np.ndarray) -> np.ndarray:
    """RSGISMorphologyDilate: window max where op > 0, zero fill."""
    return _window_reduce(img, op, "max")


def erode(img: np.ndarray, op: np.ndarray) -> np.ndarray:
    """RSGISMorphologyErode: window min where op > 0, zero fill."""
    return _window_reduce(img, op, "min")


def gradient(img: np.ndarray, op: np.ndarray) -> np.ndarray:
    """RSGISMorphologyGradient.cpp:85 — largest-smallest, one pass."""
    return _window_reduce(img, op, "max") - _window_reduce(img, op, "min")


def opening(
    img: np.ndarray, op: np.ndarray, niters: int = 1
) -> np.ndarray:
    """performOpening (RSGISMorphologyOpening.cpp:66): per iteration
    erode -> dilate; iteration i>0 reads the previous output."""
    out = img
    for _ in range(niters):
        out = dilate(erode(out, op), op)
    return out


def closing(
    img: np.ndarray, op: np.ndarray, niters: int = 1
) -> np.ndarray:
    """performClosing (RSGISMorphologyClosing.cpp:66): dilate -> erode."""
    out = img
    for _ in range(niters):
        out = erode(dilate(out, op), op)
    return out


def white_top_hat(img: np.ndarray, op: np.ndarray) -> np.ndarray:
    """Input - opening (RSGISMorphologyTopHat, 'Input Image - Opening')."""
    return img - opening(img, op)


def black_top_hat(img: np.ndarray, op: np.ndarray) -> np.ndarray:
    """Closing - input (RSGISMorphologyTopHat, 'tmp - input')."""
    return closing(img, op) - img


def local_minima(
    img: np.ndarray,
    op: np.ndarray,
    sequencial: bool = False,
    allow_equal: bool = True,
) -> np.ndarray:
    """RSGISMorphologyFindLocalMinima with the corners-only
    center-exclusion quirk and zero edge fill."""
    k = op.shape[0]
    half = k // 2
    h, w = img.shape
    padded = np.zeros((h + 2 * half, w + 2 * half), dtype=np.float64)
    padded[half : half + h, half : half + w] = img
    is_min = np.ones((h, w), dtype=bool)
    for i in range(k):
        for j in range(k):
            # the reference's (i != c) & (j != c): center row AND
            # column are BOTH excluded from the comparison
            if (i != half) and (j != half) and op[i, j] > 0:
                nb = padded[i : i + h, j : j + w]
                if allow_equal:
                    is_min &= ~(nb < img)
                else:
                    is_min &= ~(nb <= img)
    if not sequencial:
        return is_min.astype(np.float64)
    out = np.zeros((h, w), dtype=np.float64)
    out[is_min] = np.arange(1, int(is_min.sum()) + 1, dtype=np.float64)
    return out


def _window_reduce_all(
    bands: list[np.ndarray], op: np.ndarray, mode: str
) -> np.ndarray:
    """Cross-band window max/min (the *_combined_out kernels,
    RSGISMorphologyDilateAll:142 / GradientAll:148): one output band,
    the extreme over EVERY band's value in the SE window, zero fill."""
    k = op.shape[0]
    half = k // 2
    h, w = bands[0].shape
    fill = -np.inf if mode == "max" else np.inf
    red = np.maximum if mode == "max" else np.minimum
    out = np.full((h, w), fill)
    for bnd in bands:
        padded = np.zeros((h + 2 * half, w + 2 * half), dtype=np.float64)
        padded[half : half + h, half : half + w] = bnd
        for i in range(k):
            for j in range(k):
                if op[i, j] > 0:
                    out = red(out, padded[i : i + h, j : j + w])
    return out


def dilate_all(bands, op) -> np.ndarray:
    """image_dilate_combined_out."""
    return _window_reduce_all(bands, op, "max")


def erode_all(bands, op) -> np.ndarray:
    """image_erode_combined_out."""
    return _window_reduce_all(bands, op, "min")


def gradient_all(bands, op) -> np.ndarray:
    """image_gradiant_combined_out — largest-smallest over all bands
    in one window pass (the else-if in GradientAll:172 is equivalent:
    a value above the running max can never also be below the min)."""
    return _window_reduce_all(bands, op, "max") - _window_reduce_all(
        bands, op, "min"
    )


def local_minima_all(
    bands, op, sequencial: bool = False, allow_equal: bool = True
) -> np.ndarray:
    """image_local_minima_combined_out
    (RSGISMorphologyFindLocalMinimaAll:187): the centre value is the
    MIN across bands at the centre pixel; disqualification compares
    EVERY band at the (corners-only, bitwise-& quirk) SE cells."""
    k = op.shape[0]
    half = k // 2
    h, w = bands[0].shape
    center = bands[0].astype(np.float64).copy()
    for bnd in bands[1:]:
        center = np.where(bnd < center, bnd, center)
    is_min = np.ones((h, w), dtype=bool)
    for bnd in bands:
        padded = np.zeros((h + 2 * half, w + 2 * half), dtype=np.float64)
        padded[half : half + h, half : half + w] = bnd
        for i in range(k):
            for j in range(k):
                if (i != half) and (j != half) and op[i, j] > 0:
                    nb = padded[i : i + h, j : j + w]
                    if allow_equal:
                        is_min &= ~(nb < center)
                    else:
                        is_min &= ~(nb <= center)
    if not sequencial:
        return is_min.astype(np.float64)
    out = np.zeros((h, w), dtype=np.float64)
    out[is_min] = np.arange(1, int(is_min.sum()) + 1, dtype=np.float64)
    return out
