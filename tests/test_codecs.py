"""Pure-numpy media codecs: round trips, golden byte layouts, and
format-quirk handling (BMP padding/bottom-up/BGR, PPM comments, WAV
chunk walking)."""

import struct

import numpy as np
import pytest

from rsgislib_ray.functions import codecs


def test_ppm_roundtrip_and_header():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
    data = codecs.encode_ppm(img)
    assert data.startswith(b"P6\n7 5\n255\n")
    assert (codecs.decode_ppm(data) == img).all()


def test_ppm_comment_tokenizer():
    img = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    raw = b"P6\n# a comment\n2 # inline\n2\n255\n" + img.tobytes()
    assert (codecs.decode_ppm(raw) == img).all()


def test_bmp_roundtrip_padded_and_unpadded():
    rng = np.random.default_rng(5)
    for w in (4, 6, 7):  # strides 12 (no pad), 20 (2 pad), 24 (3 pad)
        img = rng.integers(0, 256, (3, w, 3), dtype=np.uint8)
        data = codecs.encode_bmp(img)
        assert (codecs.decode_bmp(data) == img).all()


def test_bmp_golden_layout():
    # 1x2 image: red then green; BGR bottom-up with 2 pad bytes
    img = np.array([[[255, 0, 0], [0, 255, 0]]], dtype=np.uint8)
    data = codecs.encode_bmp(img)
    off = struct.unpack_from("<I", data, 10)[0]
    assert off == 54
    w, h = struct.unpack_from("<ii", data, 18)
    assert (w, h) == (2, 1)
    # row: B,G,R of red pixel = 0,0,255 then green = 0,255,0 + 2 pad
    assert data[off : off + 8] == bytes([0, 0, 255, 0, 255, 0, 0, 0])
    assert (codecs.decode_bmp(data) == img).all()


def test_wav_roundtrip_mono_stereo():
    rng = np.random.default_rng(7)
    mono = rng.integers(-30000, 30000, 50).astype(np.int16)
    data = codecs.encode_wav_pcm16(mono, 16000)
    s, rate = codecs.decode_wav_pcm16(data)
    assert rate == 16000 and s.shape == (50, 1)
    assert (s[:, 0] == mono).all()
    stereo = rng.integers(-100, 100, (20, 2)).astype(np.int16)
    s2, r2 = codecs.decode_wav_pcm16(
        codecs.encode_wav_pcm16(stereo, 44100)
    )
    assert r2 == 44100 and (s2 == stereo).all()


def test_wav_chunk_walk_tolerates_extra_chunks():
    mono = np.arange(-5, 5, dtype=np.int16)
    data = bytearray(codecs.encode_wav_pcm16(mono, 8000))
    # splice a LIST chunk (odd size -> word-aligned pad) before data
    fmt_end = 12 + 8 + 16
    extra = struct.pack("<4sI", b"LIST", 5) + b"INFOx" + b"\x00"
    patched = bytes(data[:fmt_end]) + extra + bytes(data[fmt_end:])
    patched = (
        patched[:4]
        + struct.pack("<I", len(patched) - 8)
        + patched[8:]
    )
    s, rate = codecs.decode_wav_pcm16(patched)
    assert rate == 8000 and (s[:, 0] == mono).all()


def test_decoder_sniffing_errors():
    from rsgislib_ray.stages.media import ImageBytesDecoder

    d = ImageBytesDecoder()
    with pytest.raises(ValueError):
        d.decode_one(b"\x89PNG\r\n")
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    assert d.decode_one(codecs.encode_ppm(img)).shape == (2, 2, 3)
    assert d.decode_one(codecs.encode_bmp(img)).shape == (2, 2, 3)
