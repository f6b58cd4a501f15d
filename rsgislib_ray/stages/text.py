"""Text-analysis stages over the documents table (language-ID, quality
scoring, token counting, fingerprinting) — the training-data-pipeline
operators layered on the same map_batches machinery as the geo ops.
All are stateless vectorized batch transforms except language-ID,
which compiles its profiles once per actor.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from rsgislib_ray.functions.hashing import doc_fingerprint
from rsgislib_ray.functions.textstats import langid_scores, quality_stats, token_count


def add_token_count(
    ds: ray.data.Dataset, text_col: str = "text", out_col: str = "n_tokens"
) -> ray.data.Dataset:
    def tag(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return batch.append_column(
            out_col, token_count(col).cast(pa.int64())
        )

    return ds.map_batches(tag, batch_format="pyarrow")


def add_quality_stats(
    ds: ray.data.Dataset, text_col: str = "text"
) -> ray.data.Dataset:
    """Append n_chars / n_tokens / n_stopwords / n_punct + ratio
    columns (formulas mirrored by the SQL oracle)."""

    def tag(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        stats = quality_stats(col)
        out = batch
        for name, arr in stats.items():
            if name in out.column_names:  # recompute-over-existing (e.g. n_chars)
                out = out.set_column(
                    out.column_names.index(name), name, pa.array(arr)
                )
            else:
                out = out.append_column(name, pa.array(arr))
        return out

    return ds.map_batches(tag, batch_format="pyarrow")


class LangId:
    """Actor stage: deterministic n-gram language heuristic (profiles
    are module constants; an actor still amortizes the numpy setup and
    mirrors how a real fasttext-style model would be held)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_numpy(zero_copy_only=False)
        lang, score = langid_scores(texts)
        return batch.append_column(
            "lang_pred", pa.array(lang, type=pa.string())
        ).append_column("lang_score", pa.array(score))


def add_langid(ds: ray.data.Dataset, concurrency=(1, 8)) -> ray.data.Dataset:
    return ds.map_batches(
        LangId, batch_format="pyarrow", batch_size=4096, concurrency=concurrency
    )


def add_redaction(
    ds: ray.data.Dataset,
    pattern: str,
    replacement: str = "[REDACTED]",
    text_col: str = "text",
) -> ray.data.Dataset:
    """PII-style regex redaction: replace every match of ``pattern``
    (RE2 — identical semantics in Arrow and DuckDB, so the oracle is
    ``regexp_replace(..., 'g')``) and count matches per doc. Stateless
    vectorized batch transform; the compiled program lives inside
    Arrow's kernel, so there is no per-row Python."""
    import pyarrow.compute as pc

    def tag(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = pc.count_substring_regex(col, pattern).cast(pa.int64())
        red = pc.replace_substring_regex(col, pattern, replacement)
        return batch.append_column("redacted", red).append_column(
            "n_redactions", n
        )

    return ds.map_batches(tag, batch_format="pyarrow")


def add_fingerprint(
    ds: ray.data.Dataset, text_col: str = "text", out_col: str = "fingerprint"
) -> ray.data.Dataset:
    """Winnowed rolling-hash document fingerprint (stable int64)."""

    def tag(batch: pa.Table) -> pa.Table:
        fp = doc_fingerprint(batch[text_col].to_numpy(zero_copy_only=False))
        return batch.append_column(out_col, pa.array(fp))

    return ds.map_batches(tag, batch_format="pyarrow", batch_size=4096)
