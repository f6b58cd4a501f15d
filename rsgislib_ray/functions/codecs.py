"""Pure-numpy binary media codecs: P6 PPM, 24-bit uncompressed BMP,
and PCM-16 WAV.

These are REAL byte-level encoders/decoders for the uncompressed
container formats that need no external library — they upgrade the
media pipeline's decode seam from deterministic stand-ins to actual
parsing for the formats this environment can support (JPEG/PNG/MP4
still require Pillow/ffmpeg and stay behind the injectable
``decoder_factory`` seam of :mod:`rsgislib_ray.stages.media`).

Format notes (all public specifications):
- PPM P6: ``P6\\n<w> <h>\\n<maxval>\\n`` then raw RGB bytes, row-major
  top-down.
- BMP: 14-byte file header + 40-byte BITMAPINFOHEADER, 24-bit BGR,
  rows padded to 4-byte multiples, stored BOTTOM-UP.
- WAV: RIFF/WAVE with a ``fmt `` chunk (PCM, mono/stereo, 16-bit LE)
  and a ``data`` chunk.
"""

from __future__ import annotations

import struct

import numpy as np


# ---------------------------------------------------------------------------
# PPM (P6)
# ---------------------------------------------------------------------------


def encode_ppm(pixels: np.ndarray) -> bytes:
    """uint8 (h, w, 3) -> P6 bytes."""
    h, w, c = pixels.shape
    if c != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_ppm needs uint8 (h, w, 3)")
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """P6 bytes -> uint8 (h, w, 3). Handles whitespace/comment
    tokenization per the netpbm spec."""
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    # tokenize header: three integers (w, h, maxval), skipping
    # comments (# to end of line) and whitespace
    vals = []
    i = 2
    while len(vals) < 3:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":
            while i < len(data) and data[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        vals.append(int(data[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = vals
    if maxval != 255:
        raise ValueError("only maxval 255 supported")
    n = w * h * 3
    return (
        np.frombuffer(data, dtype=np.uint8, count=n, offset=i)
        .reshape(h, w, 3)
        .copy()
    )


# ---------------------------------------------------------------------------
# BMP (24-bit uncompressed)
# ---------------------------------------------------------------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """uint8 (h, w, 3) RGB -> 24-bit BMP bytes (BGR, bottom-up,
    4-byte row padding)."""
    h, w, c = pixels.shape
    if c != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_bmp needs uint8 (h, w, 3)")
    row_bytes = w * 3
    pad = (4 - row_bytes % 4) % 4
    body = bytearray()
    bgr = pixels[:, :, ::-1]
    for r in range(h - 1, -1, -1):
        body += bgr[r].tobytes() + b"\x00" * pad
    data_size = len(body)
    off = 14 + 40
    header = struct.pack(
        "<2sIHHI", b"BM", off + data_size, 0, 0, off
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0
    )
    return bytes(header) + bytes(body)


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes -> uint8 (h, w, 3) RGB."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    off = struct.unpack_from("<I", data, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", data, 14)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    comp = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError("only 24-bit uncompressed BMP supported")
    bottom_up = h > 0
    h = abs(h)
    row_bytes = w * 3
    stride = (row_bytes + 3) // 4 * 4
    out = np.empty((h, w, 3), dtype=np.uint8)
    for r in range(h):
        src = off + r * stride
        row = np.frombuffer(data, np.uint8, count=row_bytes, offset=src)
        dst = h - 1 - r if bottom_up else r
        out[dst] = row.reshape(w, 3)[:, ::-1]
    return out


# ---------------------------------------------------------------------------
# WAV (PCM 16-bit)
# ---------------------------------------------------------------------------


def encode_wav_pcm16(samples: np.ndarray, rate: int) -> bytes:
    """int16 (n,) or (n, channels) -> RIFF/WAVE PCM-16 bytes."""
    if samples.dtype != np.int16:
        raise ValueError("encode_wav_pcm16 needs int16 samples")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()
    byte_rate = rate * ch * 2
    block_align = ch * 2
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, ch, rate, byte_rate, block_align, 16
    )
    dat = struct.pack("<4sI", b"data", len(data)) + data
    riff = struct.pack(
        "<4sI4s", b"RIFF", 4 + len(fmt) + len(dat), b"WAVE"
    )
    return riff + fmt + dat


def decode_wav_pcm16(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM-16 bytes -> (int16 (n, channels), rate). Walks
    the chunk list, so extra chunks (LIST, fact) are tolerated."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    i = 12
    rate = None
    ch = None
    samples = None
    while i + 8 <= len(data):
        cid, size = struct.unpack_from("<4sI", data, i)
        body = i + 8
        if cid == b"fmt ":
            audio_fmt, ch, rate = struct.unpack_from("<HHI", data, body)
            bits = struct.unpack_from("<H", data, body + 14)[0]
            if audio_fmt != 1 or bits != 16:
                raise ValueError("only PCM-16 WAV supported")
        elif cid == b"data":
            samples = np.frombuffer(
                data, dtype="<i2", count=size // 2, offset=body
            )
        i = body + size + (size & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return samples.reshape(-1, ch).astype(np.int16), int(rate)
