"""Pytest-level parity checks for the SQL-mirror oracles added for the
hash/synth pipelines (fingerprint, simhash, minhash, langid, the
interleaved synth mirror, ann_lsh, overlay). The driver gate runs the
same comparison out-of-band; these tests pin the mirrors inside
`python -m pytest -x -q` so a regression in EITHER the engine kernels
OR the SQL generators fails the suite."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

TABLES = ["documents", "embeddings", "lineitem", "part", "events", "customer", "supplier"]

# Queries whose engine output and DuckDB oracle must agree exactly.
PARITY_QUERIES = [
    "fingerprint",
    "dedup_simhash",
    "dedup_minhash",
    "langid",
    "training_data_pipeline",
    "interleaved_parse_tile",
    "flagship_join",
    "flagship_zonal",
    "ann_lsh",
    "overlay_doc_polys",
    "pack_sequences",
    "redact_terms",
    "kgram_cross_dup",
    "tfidf_top_terms",
    "decontaminate",
    "span_kind_counts",
    "per_source_cap",
    "media_decode",
    "media_pipeline",
    "repetition_stats",
    "unigram_lm_score",
    "chunk_documents",
    "shuffle_shards",
    "semantic_dedup",
    "raster_pyramid",
    "class_change_matrix",
    "event_funnel",
    "pagerank_knn",
    "zonal_winsorized",
    "token_pmi",
    "morph_dilate",
    "quality_classifier",
    "dsir_select",
    "bpe_pair_counts",
    "paragraph_dedup",
    # round-2 continuation: geostat / lines / closed-form fits
    "grid_interp",
    "semivariogram",
    "points_along_lines",
    "orthogonal_lines",
    "line_intersections",
    "pt_dist_angle",
    "accuracy_scores",
    "reproject_utm",
    "kmeans_exact",
    "closed_thresholds",
    "pca_project_2d",
    "mnf_project_2d",
    "vif_scores",
    "random_points",
    "noise_covariance",
    "spectral_unmix",
    "grouped_linear_fit",
]


def _to_df(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype(np.int64)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype(np.int64)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(np.float64)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


@pytest.fixture(scope="module")
def oracle_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", PARITY_QUERIES)
def test_oracle_parity(ray_session, sf_dir, oracle_con, name):
    from rsgislib_ray.pipelines import queries as qmod

    fn = qmod.queries()[name]
    sql = qmod.oracle_sql()[name]

    eng = _normalize(_to_df(fn(sf_dir)))
    ora = _normalize(oracle_con.execute(sql).df())

    assert list(eng.columns) == list(ora.columns), (
        f"{name}: column mismatch {list(eng.columns)} vs {list(ora.columns)}"
    )
    assert len(eng) == len(ora), f"{name}: {len(eng)} vs {len(ora)} rows"
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)
