"""Text-analysis kernels for the documents table — all vectorized
(pyarrow.compute / pandas string kernels), designed so that the simple
measures are bit-identical to a DuckDB SQL oracle (token counts, ratios)
while the heuristics (language-ID) are deterministic but model-free.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Small fixed stopword list; the SQL oracle embeds the same list.
STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")

# Deterministic per-language character-trigram profiles for the
# heuristic language scorer. Purely synthetic/heuristic (no model
# download possible here); deterministic so tests can pin outputs.
_LANG_PROFILES = {
    "en": ("the", "and", "ing", "ion", "ent"),
    "es": ("que", "los", "ión", "nte", "ado"),
    "de": ("der", "die", "und", "sch", "ein"),
    "fr": ("les", "ent", "ion", "que", "des"),
    "zh": ("de ", "shi", "zho", "ong", "ian"),
}


def token_count(text: pa.Array) -> pa.Array:
    """Whitespace token count == DuckDB ``len(string_split(text, ' '))``
    (single-space split semantics, including empty tokens)."""
    return pc.list_value_length(pc.split_pattern(text, " "))


def word_lists(text: pa.Array) -> pa.ListArray:
    return pc.split_pattern(text, " ")


def quality_stats(text: pa.Array) -> dict[str, np.ndarray]:
    """Length / token / stopword / punctuation quality signals.

    Ratios are computed with the exact expression ``cast / cast`` on
    int counts so a SQL oracle using the same formula matches
    bit-for-bit.
    """
    n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
    words = pc.split_pattern(text, " ")
    n_tokens = (
        pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
    )
    flat = words.flatten()
    parent = np.repeat(
        np.arange(len(words), dtype=np.int64),
        np.diff(words.offsets.to_numpy(zero_copy_only=False)),
    )
    is_stop = pc.is_in(flat, value_set=pa.array(list(STOPWORDS))).to_numpy(
        zero_copy_only=False
    )
    n_stop = np.bincount(parent[is_stop], minlength=len(words)).astype(np.int64)
    n_punct = (
        pc.count_substring_regex(text, r"[^\w\s]")
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    denom = np.maximum(n_tokens, 1).astype(np.float64)
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "n_stopwords": n_stop,
        "n_punct": n_punct,
        "stopword_ratio": n_stop.astype(np.float64) / denom,
        "punct_ratio": n_punct.astype(np.float64)
        / np.maximum(n_chars, 1).astype(np.float64),
        "mean_token_len": (n_chars - (n_tokens - 1)).astype(np.float64) / denom,
    }


def langid_scores(texts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic n-gram-overlap language heuristic.

    Scores each doc against the fixed trigram profiles by counting
    profile-trigram occurrences per language, normalized by doc length;
    returns (best_lang: object array, best_score: float64). Ties break
    to the alphabetically first language code.
    """
    langs = sorted(_LANG_PROFILES)
    arr = pa.array(texts.tolist() if isinstance(texts, np.ndarray) else list(texts))
    lower = pc.utf8_lower(arr)
    n = pc.utf8_length(arr).to_numpy(zero_copy_only=False).astype(np.float64)
    scores = np.zeros((len(langs), len(texts)), dtype=np.float64)
    for i, lang in enumerate(langs):
        for tri in _LANG_PROFILES[lang]:
            scores[i] += pc.count_substring(lower, tri).to_numpy(zero_copy_only=False)
    scores /= np.maximum(n, 1.0)
    best = scores.argmax(axis=0)
    return (
        np.asarray([langs[i] for i in best], dtype=object),
        scores[best, np.arange(len(texts))],
    )


def word_shingles(words: list[str], k: int = 3) -> list[str]:
    """k-word shingles of a token list (for MinHash / Jaccard)."""
    if len(words) < k:
        return [" ".join(words)] if words else []
    return [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]


def token_count_regex(text: pa.Array) -> pa.Array:
    """BPE-ish sub-word unit count: word runs + individual
    non-space punctuation (the GPT-2-pretokenizer shape expressed as
    one RE2 pattern — Arrow and DuckDB both use RE2, so
    ``len(regexp_extract_all(text, '\\w+|[^\\w\\s]'))`` matches
    exactly)."""
    return pc.count_substring_regex(text, r"\w+|[^\w\s]")


def parse_mtl_lines(
    doc_ids: "np.ndarray", texts: list[str]
) -> "pa.Table":
    """Landsat MTL header parser (tools/sensors.py:11
    read_landsat_mtl_to_dict) over whole-document strings, long-form
    output (doc_id, grp, key, val). The reference's literal quirks
    are kept: the dict is FLAT (a nested GROUP simply switches the
    current dict, so outer groups opened before an inner GROUP keep
    no keys), END_GROUP lines and lines without exactly one '=' are
    skipped, values are stripped and double-quotes removed.
    Vectorized across lines: explode -> one split('=') pass ->
    forward-filled group index via maximum.accumulate."""
    import numpy as np
    import pyarrow as pa

    lines = []
    docs = []
    for d, t in zip(doc_ids, texts):
        ls = t.split("\n")
        lines.extend(ls)
        docs.extend([d] * len(ls))
    if not lines:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "grp": pa.array([], pa.string()),
                "key": pa.array([], pa.string()),
                "val": pa.array([], pa.string()),
            }
        )
    docs = np.asarray(docs, dtype=np.int64)
    arr = np.char.strip(np.asarray(lines, dtype=object).astype(str))
    nonempty = arr != ""
    eq_count = np.char.count(arr, "=")
    one_eq = nonempty & (eq_count == 1)
    head = np.char.strip(
        np.asarray([a.partition("=")[0] for a in arr], dtype=str)
    )
    tail = np.asarray(
        [a.partition("=")[2] for a in arr], dtype=str
    )
    is_group = one_eq & (head == "GROUP")
    is_end = one_eq & (head == "END_GROUP")
    is_kv = one_eq & ~is_group & ~is_end
    # forward-fill the group ordinal (fixtures/files start with GROUP,
    # matching the reference's implicit requirement that a key line
    # only appears after some GROUP)
    gid = np.where(is_group, np.arange(len(arr)), -1)
    gid = np.maximum.accumulate(gid)
    grp_names = np.char.strip(tail)
    sel = is_kv & (gid >= 0)
    return pa.table(
        {
            "doc_id": docs[sel],
            "grp": pa.array(
                grp_names[gid[sel]].tolist(), pa.string()
            ),
            "key": pa.array(head[sel].tolist(), pa.string()),
            "val": pa.array(
                np.char.replace(
                    np.char.strip(tail[sel]), '"', ""
                ).tolist(),
                pa.string(),
            ),
        }
    )
