"""Multimodal (image/audio) stages over opaque binary columns.

The interleaved table carries media as ``media_ref`` strings (span
kind="image") or opaque ``binary`` payload columns with typed metadata.
Real codecs (Pillow/ffmpeg/torchvision) are NOT available in this
container, so the DECODE KERNEL is stubbed — either a deterministic
fake decoder (default: counter-based pixels seeded by the ref, so
tests can assert exact outputs) or ``NotImplementedError`` in strict
mode — while everything Ray-side is real and tested: schema contracts,
actor-pool stage shape (decoder state built once per actor), small
batch sizes for wide binary rows, and the fixed-shape tensor output
layout a downstream model stage would consume.

This is the engine analog of the reference's image I/O + filter
pipeline (GDAL decode -> numpy kernel -> write,
/root/reference/python/rsgislib/imagefilter/tiledfilter.py:944-1060),
re-expressed as map_batches over binary columns.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from rsgislib_ray.functions.hashing import hash_strings, splitmix64

THUMB = 8  # fake-decode thumbnail side (pixels)


class FakeImageDecoder:
    """Deterministic stand-in for a real image codec: pixels are a
    counter-based function of the media_ref, so decode(ref) is
    reproducible across processes and parallelism levels."""

    def decode(self, refs: np.ndarray) -> np.ndarray:
        h = hash_strings(refs)
        n = len(refs)
        idx = np.arange(THUMB * THUMB * 3, dtype=np.uint64)
        px = splitmix64(h[:, None] ^ idx[None, :]) % np.uint64(256)
        return px.astype(np.uint8).reshape(n, THUMB, THUMB, 3)


class DecodeImages:
    """Actor stage: media_ref column -> fixed-shape uint8 tensor column
    (``image``: FixedShapeTensor-compatible FixedSizeList layout) +
    basic per-image features. ``strict=True`` raises NotImplementedError
    where a real codec would run."""

    def __init__(self, strict: bool = False):
        if strict:
            raise NotImplementedError(
                "no image codec available in this environment; install a "
                "decoder and replace FakeImageDecoder"
            )
        self.decoder = FakeImageDecoder()

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch["media_ref"].to_numpy(zero_copy_only=False)
        imgs = self.decoder.decode(refs)
        flat = imgs.reshape(len(refs), -1)
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(flat.ravel(), type=pa.uint8()), flat.shape[1]
        )
        mean = flat.mean(axis=1)
        out = batch.append_column("image", arr)
        out = out.append_column("img_mean", pa.array(mean))
        return out


def extract_media_refs(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Explode image spans into one row per media ref (doc_id,
    span_pos, media_ref) — the gather step before a decode stage."""

    def explode(batch: pa.Table) -> pa.Table:
        spans = batch["spans"]
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = spans.flatten()
        off = spans.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        off = off - off[0]
        parent = np.repeat(np.arange(len(spans), dtype=np.int64), np.diff(off))
        kind = flat.field("kind").to_numpy(zero_copy_only=False)
        is_img = kind == "image"
        rows = parent[is_img]
        doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)[rows]
        pos = (np.arange(len(flat)) - np.repeat(off[:-1], np.diff(off)))[is_img]
        return pa.table(
            {
                "doc_id": pa.array(doc_id, pa.string()),
                "span_pos": pa.array(pos, pa.int32()),
                "media_ref": flat.field("media_ref").filter(pa.array(is_img)),
            }
        )

    return docs.map_batches(explode, batch_format="pyarrow")


def decode_media(
    docs: ray.data.Dataset,
    strict: bool = False,
    concurrency=(1, 4),
    batch_size: int = 256,  # wide binary rows -> small batches
) -> ray.data.Dataset:
    """Full media path: explode refs -> actor-pool decode -> tensor +
    feature columns. Batch size is deliberately small so
    batch x concurrency of decoded tensors fits worker heaps (the
    binary-payload sizing rule)."""
    refs = extract_media_refs(docs)
    return refs.map_batches(
        DecodeImages,
        fn_constructor_kwargs={"strict": strict},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
