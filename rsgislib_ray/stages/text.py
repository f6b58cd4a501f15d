"""Text-analysis stages over the documents table (language-ID, quality
scoring, token counting, fingerprinting) — the training-data-pipeline
operators layered on the same map_batches machinery as the geo ops.
All are stateless vectorized batch transforms except language-ID,
which compiles its profiles once per actor.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
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


def tfidf_top_terms(
    ds: ray.data.Dataset,
    top_k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Top-k terms per document by tf-idf (tf = in-doc occurrence
    count, idf = ln(N / df) with df = docs containing the term).

    Two-pass distributed shape: pass 1 pre-reduces per-batch DISTINCT
    (term, doc) pairs into partial df counts and a native
    ``groupby(term).sum`` finishes them (one narrow shuffle of term
    counts); the (term, df) map — vocabulary-sized, tiny next to the
    corpus — is broadcast via ``ray.put`` and pass 2 scores each doc's
    terms vectorized and keeps the top k (ties broken by term string
    ascending, matching the SQL oracle's row_number order). Score
    arithmetic is one multiply of an int by ln(double) — bit-identical
    between numpy and the oracle."""
    from rsgislib_ray.functions.textstats import word_lists

    def df_partial(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        words = word_lists(col)
        flat = words.flatten().to_numpy(zero_copy_only=False)
        parent = np.repeat(
            np.arange(len(words), dtype=np.int64),
            np.diff(words.offsets.to_numpy(zero_copy_only=False)),
        )
        pairs = pd.DataFrame({"w": flat, "d": parent}).drop_duplicates()
        cnt = pairs.groupby("w", as_index=False).size()
        return pa.table(
            {
                "term": cnt["w"].to_numpy(dtype=object),
                "partial": cnt["size"].to_numpy().astype(np.int64),
            }
        )

    df_tbl = (
        ds.map_batches(df_partial, batch_format="pyarrow")
        .groupby("term")
        .sum("partial")
    )
    n_docs = ds.count()
    df_blocks = df_tbl.to_arrow_refs()

    def build_df(tables: list):
        # idf via SCALAR math.log (glibc): bit-identical to DuckDB's
        # ln(); numpy's vectorized np.log differs by 1 ulp on ~30% of
        # inputs and would break the oracle's float compare
        import math

        good = [t for t in tables if t.num_rows]
        if not good:
            return pd.Series(dtype=np.float64)
        t = pa.concat_tables(good)
        dfv = t["sum(partial)"].to_numpy().astype(np.int64)
        idf = np.array(
            [math.log(float(n_docs) / d) for d in dfv], dtype=np.float64
        )
        return pd.Series(
            idf, index=t["term"].to_numpy(zero_copy_only=False)
        )

    def score(batch: pa.Table, _blocks=None) -> pa.Table:
        from rsgislib_ray.state.broadcast import cached_multi

        dfs = cached_multi(_blocks, build_df)
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        words = word_lists(col)
        ids = batch[id_col].to_numpy()
        flat = words.flatten().to_numpy(zero_copy_only=False)
        parent = np.repeat(
            np.arange(len(words), dtype=np.int64),
            np.diff(words.offsets.to_numpy(zero_copy_only=False)),
        )
        # vectorized per-(doc, term) tf over the whole batch
        tfd = (
            pd.DataFrame({"d": parent, "w": flat})
            .groupby(["d", "w"], as_index=False, sort=True)
            .size()
        )
        d = tfd["d"].to_numpy()
        terms = tfd["w"].to_numpy(dtype=object)
        tf = tfd["size"].to_numpy().astype(np.int64)
        s = tf * dfs[terms].to_numpy()
        # top-k per doc: lexsort by (doc, -score, term); term asc is the
        # groupby sort order, preserved by the stable lexsort
        order = np.lexsort((np.arange(len(s)), -s, d))
        d2, t2, s2 = d[order], terms[order], s[order]
        newdoc = np.concatenate([[True], d2[1:] != d2[:-1]])
        starts = np.flatnonzero(newdoc)
        rank = np.arange(len(d2), dtype=np.int64) - np.repeat(
            starts, np.diff(np.concatenate([starts, [len(d2)]]))
        ) + 1
        keep = rank <= top_k
        return pa.table(
            {
                id_col: ids[d2[keep]],
                "term": pa.array(t2[keep].astype(object), pa.string()),
                "tfidf": s2[keep],
                "rank": rank[keep],
            }
        )

    return ds.map_batches(
        score,
        fn_kwargs={"_blocks": df_blocks},
        batch_format="pyarrow",
    )
