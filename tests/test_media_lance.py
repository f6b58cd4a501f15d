"""Media decode plumbing + Lance-style adapter round-trips."""

import os

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from rsgislib_ray.sources import lance_io
from rsgislib_ray.sources.synth import synth_docs_dataset
from rsgislib_ray.stages.media import (
    THUMB,
    DecodeImages,
    FakeImageDecoder,
    decode_media,
    extract_media_refs,
)


def test_extract_media_refs(ray_session):
    docs = synth_docs_dataset(500)
    refs = extract_media_refs(docs).to_pandas()
    assert len(refs) > 0
    assert refs["media_ref"].str.startswith("media://").all()
    # ref encodes its own doc id
    for _, r in refs.head(20).iterrows():
        assert r["media_ref"].split("/")[2] == r["doc_id"]


def test_decode_media_deterministic(ray_session):
    docs = synth_docs_dataset(300)
    out1 = decode_media(docs).to_pandas().sort_values(
        ["doc_id", "span_pos"]
    )
    out2 = decode_media(docs).to_pandas().sort_values(
        ["doc_id", "span_pos"]
    )
    assert len(out1) == len(out2) > 0
    np.testing.assert_array_equal(
        np.stack(out1["image"].to_numpy()),
        np.stack(out2["image"].to_numpy()),
    )
    # tensor layout contract
    assert len(out1.iloc[0]["image"]) == THUMB * THUMB * 3
    assert out1["img_mean"].between(0, 255).all()


def test_decoder_is_ref_dependent():
    d = FakeImageDecoder()
    a = d.decode(np.asarray(["media://d0/1", "media://d0/1", "media://d1/3"], dtype=object))
    np.testing.assert_array_equal(a[0], a[1])
    assert not np.array_equal(a[0], a[2])


def test_strict_mode_raises():
    with pytest.raises(NotImplementedError):
        DecodeImages(strict=True)


def test_lance_roundtrip(ray_session, tmp_path):
    uri = str(tmp_path / "tbl")
    ds = ray.data.range(1000).map_batches(
        lambda t: pa.table({"id": t["id"], "v": t["id"].to_numpy() * 2}),
        batch_format="pyarrow",
    )
    man = lance_io.write_fragments(ds, uri, lineage=[{"op": "double"}])
    assert man["version"] == 1
    assert sum(f["rows"] for f in man["fragments"]) == 1000
    back = lance_io.read_table(uri).to_pandas().sort_values("id")
    np.testing.assert_array_equal(back["v"].to_numpy(), np.arange(1000) * 2)
    # column pruning
    only_v = lance_io.read_table(uri, columns=["v"]).to_pandas()
    assert list(only_v.columns) == ["v"]
    # second version; latest wins
    man2 = lance_io.write_fragments(ds.limit(10), uri)
    assert man2["version"] == 2
    assert lance_io.read_table(uri).count() == 10
    assert lance_io.read_table(uri, version=1).count() == 1000


def test_lance_arrow_write(ray_session, tmp_path):
    uri = str(tmp_path / "small")
    tbl = pa.table({"a": [1, 2, 3]})
    man = lance_io.write_table_arrow(tbl, uri)
    assert man["fragments"][0]["rows"] == 3
    assert lance_io.read_table(uri).count() == 3
