"""Stable, vectorized 64-bit hashing used by dedup / fingerprint ops.

Everything here must be deterministic across processes and across the
8-CPU vs 32-CPU runs (the north rule's N-vs-4N output-equality), so no
Python ``hash()`` (salted per process). String hashing goes through
``pandas.util.hash_pandas_object`` (SipHash-1-3 with a fixed key —
vectorized C, stable for a pinned pandas); integer mixing is
splitmix64 in numpy uint64.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_HASH_KEY = "0123456789123456"  # pandas' documented default, pinned explicitly

_U = np.uint64


def hash_strings(values) -> np.ndarray:
    """Vectorized stable 64-bit hash of a string sequence -> uint64."""
    s = pd.Series(values, dtype="object")
    return pd.util.hash_pandas_object(s, index=False, hash_key=_HASH_KEY).to_numpy(
        dtype=np.uint64
    )


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic uint64 mixer (public splitmix64 constants).
    uint64 wraparound is intentional (mod 2^64)."""
    with np.errstate(over="ignore"):
        z = x.astype(np.uint64) + _U(0x9E3779B97F4A7C15)
        z = (z ^ (z >> _U(30))) * _U(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> _U(27))) * _U(0x94D049BB133111EB)
        return z ^ (z >> _U(31))


def hash_combine(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Order-sensitive combine of two uint64 hash arrays."""
    return splitmix64(a.astype(np.uint64) ^ (splitmix64(b.astype(np.uint64)) + _U(0x9E3779B97F4A7C15)))


_FP_BASE = _U(1000003)


def kgram_hashes(text: str, k: int = 8) -> np.ndarray:
    """Rolling k-gram hashes of a document's bytes — fully vectorized.

    Window hash = ``sum(byte[i+j] * BASE^(k-1-j)) mod 2^64`` (uint64
    wraparound IS the modulus) computed as a sliding-window multiply,
    then splitmix64-mixed. Returns uint64 of length ``max(0, n-k+1)``.
    """
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    if len(b) < k:
        b = np.pad(b, (0, k - len(b)), constant_values=0)
    with np.errstate(over="ignore"):  # uint64 wraparound IS the modulus
        pows = np.empty(k, dtype=np.uint64)
        p = _U(1)
        for j in range(k - 1, -1, -1):
            pows[j] = p
            p = p * _FP_BASE
        win = np.lib.stride_tricks.sliding_window_view(b, k)
        return splitmix64((win * pows).sum(axis=1, dtype=np.uint64))


def winnow_fingerprints(text: str, k: int = 8, w: int = 16) -> np.ndarray:
    """Winnowing (Schleimer et al. 2003): per window of ``w``
    consecutive k-gram hashes keep the minimum. Returns the sorted
    unique selected hashes (uint64)."""
    h = kgram_hashes(text, k)
    if len(h) == 0:
        return np.empty(0, dtype=np.uint64)
    if len(h) <= w:
        return np.unique(h.min(keepdims=True))
    win = np.lib.stride_tricks.sliding_window_view(h, w)
    return np.unique(win.min(axis=1))


def polyhash_strings(values) -> np.ndarray:
    """Vectorized 64-bit polynomial string hash: Horner over utf-8
    bytes with base ``_FP_BASE`` (uint64 wraparound), finished with
    splitmix64. Unlike ``hash_strings`` (SipHash via pandas C code)
    every step is plain integer arithmetic, so SQL oracles reproduce
    it exactly (queries.py ``_sm64_chain`` + a B^k powers table).
    The position loop runs max-string-length times over vectorized
    arrays — fine for tokens/shingles."""
    enc = [v.encode("utf-8") if isinstance(v, str) else str(v).encode("utf-8")
           for v in values]
    n = len(enc)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    lens = np.fromiter((len(b) for b in enc), dtype=np.int64, count=n)
    blob = np.frombuffer(b"".join(enc), dtype=np.uint8)
    starts = np.cumsum(lens) - lens
    h = np.zeros(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(int(lens.max(initial=0))):
            active = j < lens
            h[active] = h[active] * _FP_BASE + blob[starts[active] + j].astype(
                np.uint64
            )
    return splitmix64(h)


def doc_fingerprint(texts, k: int = 8, w: int = 16) -> np.ndarray:
    """One int64 fingerprint per document: order-insensitive combine of
    its winnowed k-gram hash set. Equal for byte-identical docs, stable
    under re-partitioning."""
    out = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        fps = winnow_fingerprints(t, k, w)
        acc = splitmix64(fps + _U(len(fps))).sum(dtype=np.uint64)
        out[i] = np.int64(np.uint64(acc) >> _U(1))  # keep non-negative
    return out
