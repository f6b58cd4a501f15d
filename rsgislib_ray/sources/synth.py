"""Deterministic synthesis of the interleaved text+media document table.

The engine's primary input (BASELINE.json input_hint) is a Lance-style
table ``(doc_id: string, spans: list<struct<kind, text, media_ref,
offset:int32>>)``. No external data exists, so this module synthesizes
it deterministically (FIXTURES.md F1): counter-based hashing
(splitmix64 of the doc index) replaces a stateful RNG so that ANY
partitioning of the doc-index range produces identical rows — the
8-CPU and 32-CPU runs must generate bit-identical inputs.

Per doc (seeded on ``splitmix64(doc_index ^ seed)``):
- 2-6 spans; exactly one geometry span (point ~90%, poly ~10%) at a
  pseudo-random position, interleaved with text and image spans so
  span-sequence preservation is genuinely exercised;
- point coords: 80% uniform over [0,100)^2, 20% from 3 Gaussian
  hot-spot clusters (sigma=0.5) to create cell skew (FIXTURES.md F1);
- polys: small CCW rectangles with jittered size;
- fixed edge-case docs 0-9: boundary/origin/out-of-extent points and a
  degenerate polygon (the reference's isclose-origin and out-of-image
  paths, /root/reference/python/rsgislib/zonalstats/__init__.py:1548-1586).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from rsgislib_ray.functions.hashing import splitmix64

_U = np.uint64

HOTSPOTS = np.array([[20.0, 30.0], [65.0, 70.0], [80.0, 15.0]])
_VOCAB_N = 997


def _u01(h: np.ndarray, salt: int) -> np.ndarray:
    """Counter-based uniform [0,1) doubles from a uint64 stream."""
    return splitmix64(h ^ _U(salt)).astype(np.float64) / 18446744073709551616.0


def _gauss(h: np.ndarray, salt: int) -> np.ndarray:
    """Counter-based standard normal via Box-Muller."""
    u1 = np.maximum(_u01(h, salt), 1e-12)
    u2 = _u01(h, salt + 0x51)
    return np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)


def synth_docs_batch(indices: np.ndarray, seed: int = 42) -> pa.Table:
    """Build the interleaved docs table for an arbitrary set of doc
    indices — fully vectorized (no per-span Python loop in the hot
    path; string assembly uses numpy/pandas char kernels)."""
    idx = np.asarray(indices, dtype=np.uint64)
    n = len(idx)
    h = splitmix64(idx ^ splitmix64(np.full(n, seed, dtype=np.uint64)))

    n_spans = (2 + (splitmix64(h ^ _U(1)) % _U(5))).astype(np.int64)  # 2..6
    geom_pos = (splitmix64(h ^ _U(2)) % n_spans.astype(np.uint64)).astype(np.int64)
    is_poly = (splitmix64(h ^ _U(3)) % _U(10)) == 0  # ~10%

    # point coordinates (used as poly anchor too)
    hot = (splitmix64(h ^ _U(4)) % _U(5)) == 0  # 20% hot-spot
    which = (splitmix64(h ^ _U(5)) % _U(3)).astype(np.int64)
    px = np.where(
        hot,
        HOTSPOTS[which, 0] + 0.5 * _gauss(h, 6),
        _u01(h, 7) * 100.0,
    )
    py = np.where(
        hot,
        HOTSPOTS[which, 1] + 0.5 * _gauss(h, 8),
        _u01(h, 9) * 100.0,
    )
    px = np.clip(px, 0.0, 99.999999)
    py = np.clip(py, 0.0, 99.999999)

    # fixed edge cases at global doc indices 0..9
    for i_local, gidx in enumerate(idx.tolist()):
        if gidx == 0:  # origin (isclose guard)
            px[i_local], py[i_local], is_poly[i_local] = 0.0, 0.0, False
        elif gidx == 1:  # on a tile boundary (30.0)
            px[i_local], py[i_local], is_poly[i_local] = 30.0, 30.0, False
        elif gidx == 2:  # outside the extent
            px[i_local], py[i_local], is_poly[i_local] = 150.0, 150.0, False
        elif gidx == 3:  # on a cell boundary at level 10 (100/1024*512=50)
            px[i_local], py[i_local], is_poly[i_local] = 50.0, 50.0, False
        elif gidx == 4:  # degenerate tiny polygon
            px[i_local], py[i_local], is_poly[i_local] = 10.0, 10.0, True

    # poly rectangles: CCW, jittered size, clipped to frame
    w = 0.5 + 4.0 * _u01(h, 10)
    hgt = 0.5 + 4.0 * _u01(h, 11)
    pxmax = np.minimum(px + w, 99.999999)
    pymax = np.minimum(py + hgt, 99.999999)

    # ---- assemble the span-level arrays -------------------------------
    total = int(n_spans.sum())
    parent = np.repeat(np.arange(n, dtype=np.int64), n_spans)
    cum = np.cumsum(n_spans) - n_spans
    pos = np.arange(total, dtype=np.int64) - np.repeat(cum, n_spans)

    g = geom_pos[parent]
    is_geom = pos == g
    poly_span = is_geom & is_poly[parent]
    point_span = is_geom & ~is_poly[parent]
    # non-geom spans alternate text / image
    image_span = ~is_geom & (pos % 2 == 1)
    text_span = ~is_geom & ~image_span

    kinds = np.empty(total, dtype=object)
    kinds[point_span] = "point"
    kinds[poly_span] = "poly"
    kinds[image_span] = "image"
    kinds[text_span] = "text"

    import pandas as pd

    texts = np.empty(total, dtype=object)
    fmt = np.vectorize(lambda a, b: f"{a:.6f} {b:.6f}", otypes=[object])
    if point_span.any():
        pp = parent[point_span]
        texts[point_span] = fmt(px[pp], py[pp])
    if poly_span.any():
        pp = parent[poly_span]
        fmt_ring = np.vectorize(
            lambda x0, y0, x1, y1: (
                f"{x0:.6f} {y0:.6f},{x1:.6f} {y0:.6f},"
                f"{x1:.6f} {y1:.6f},{x0:.6f} {y1:.6f}"
            ),
            otypes=[object],
        )
        texts[poly_span] = fmt_ring(px[pp], py[pp], pxmax[pp], pymax[pp])
    if text_span.any():
        sh = splitmix64(h[parent[text_span]] ^ pos[text_span].astype(np.uint64))
        toks = pd.Series(
            ["tok" + s for s in (sh % _U(_VOCAB_N)).astype(np.int64).astype(str)]
        )
        toks = (
            toks
            + " tok"
            + pd.Series((splitmix64(sh) % _U(_VOCAB_N)).astype(np.int64)).astype(str)
            + " tok"
            + pd.Series(
                (splitmix64(sh ^ _U(5)) % _U(_VOCAB_N)).astype(np.int64)
            ).astype(str)
        )
        texts[text_span] = toks.to_numpy(dtype=object)
    texts[image_span] = ""

    doc_ids = pd.Series(idx.astype(np.int64)).map("d{:08d}".format).to_numpy(object)
    media = np.empty(total, dtype=object)
    media[~image_span] = ""
    if image_span.any():
        media[image_span] = (
            "media://"
            + pd.Series(doc_ids[parent[image_span]]).astype(str)
            + "/"
            + pd.Series(pos[image_span]).astype(str)
        ).to_numpy(dtype=object)

    struct = pa.StructArray.from_arrays(
        [
            pa.array(kinds, type=pa.string()),
            pa.array(texts, type=pa.string()),
            pa.array(media, type=pa.string()),
            pa.array(pos.astype(np.int32)),
        ],
        names=["kind", "text", "media_ref", "offset"],
    )
    list_offsets = pa.array(
        np.concatenate([[0], np.cumsum(n_spans)]).astype(np.int32)
    )
    spans = pa.ListArray.from_arrays(list_offsets, struct)
    return pa.table({"doc_id": pa.array(doc_ids, type=pa.string()), "spans": spans})


def synth_docs_dataset(
    n_docs: int, seed: int = 42, override_num_blocks: int | None = None
) -> ray.data.Dataset:
    """Distributed deterministic docs table: ``range(n_docs)`` ->
    ``map_batches`` — generation is partition-independent, so any block
    layout yields the same rows."""
    ds = ray.data.range(n_docs, override_num_blocks=override_num_blocks)

    def gen(batch: pa.Table) -> pa.Table:
        return synth_docs_batch(batch["id"].to_numpy(), seed=seed)

    return ds.map_batches(gen, batch_format="pyarrow")
