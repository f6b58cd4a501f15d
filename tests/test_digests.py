"""Checksum / base64 utilities (functions/digests.py) vs the
reference's tools/filetools.py create_*_hash family and
tools/utils.py encode/decode_base64_text.

The create_*_hash functions are hashlib streamed in 4 KiB blocks;
digests are chunking-independent, so the contract here is (a) the
block loop equals one-shot hashlib for any block size, and (b) the
algorithm map is right, pinned by fixed known-answer vectors
(computed from the published FIPS/RFC test input "abc" — these hex
strings are the standards' own KATs, so a wrong constructor mapping
cannot pass).
"""

import hashlib
import io

import pytest

from rsgislib_ray.functions.digests import (
    HASH_ALGOS,
    decode_base64_text,
    encode_base64_text,
    file_digest,
    stream_digest,
    text_digest,
)

# Known-answer vectors for input b"abc" (FIPS 180-4 / FIPS 202 /
# RFC 1321 / RFC 7693 published test values).
ABC_KAT = {
    "md5": "900150983cd24fb0d6963f7d28e17f72",
    "sha1": "a9993e364706816aba3e25717850c26c9cd0d89d",
    "sha224": "23097d223405d8228642a477bda255b32aadbce4bda0b3f7e36c9da7",
    "sha256": (
        "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad"
    ),
    "sha384": (
        "cb00753f45a35e8bb5a03d699ac65007272c32ab0eded1631a8b605a43ff5bed"
        "8086072ba1e7cc2358baeca134c825a7"
    ),
    "sha512": (
        "ddaf35a193617abacc417349ae20413112e6fa4e89a97ea20a9eeee64b55d39a"
        "2192992a274fc1a836ba3c23a3feebbd454d4423643ce80e2a9ac94fa54ca49f"
    ),
    "sha3_224": (
        "e642824c3f8cf24ad09234ee7d3c766fc9a3a5168d0c94ad73b46fdf"
    ),
    "sha3_256": (
        "3a985da74fe225b2045c172d6bd390bd855f086e3e9d525b46bfe24511431532"
    ),
    "sha3_384": (
        "ec01498288516fc926459f58e2c6ad8df9b473cb0fc08c2596da7cf0e49be4b2"
        "98d88cea927ac7f539f1edf228376d25"
    ),
    "sha3_512": (
        "b751850b1a57168a5693cd924b6b096e08f621827444f70d884f5d0240d2712e"
        "10e116e9192af3c91a7ec57647e3934057340b4cf408d5a56592f8274eec53f0"
    ),
    "blake2b": (
        "ba80a53f981c4d0d6a2797b69f12f6e94c212f14685ac4b74b12bb6fdbffa2d1"
        "7d87c5392aab792dc252d5de4533cc9518d38aa8dbf1925ab92386edd4009923"
    ),
    "blake2s": (
        "508c5e8c327c14e2e1a72ba34eeb452f37458b209ed63a294d999b4c86675982"
    ),
}


def test_known_answer_vectors():
    assert set(ABC_KAT) == set(HASH_ALGOS)
    for algo, want in ABC_KAT.items():
        assert text_digest("abc", algo) == want, algo
        assert stream_digest(io.BytesIO(b"abc"), algo) == want, algo


@pytest.mark.parametrize("block_size", [1, 3, 4096, 100_000])
def test_block_loop_equals_one_shot(block_size):
    """The reference's 4 KiB read loop (filetools.py:1050) produces
    the same digest as one-shot hashlib for every chunking, including
    payloads spanning many blocks and a final partial block."""
    payload = bytes(range(256)) * 300  # 76,800 bytes, not 4k-aligned
    for algo in HASH_ALGOS:
        h = HASH_ALGOS[algo](payload).hexdigest()
        got = stream_digest(io.BytesIO(payload), algo, block_size)
        assert got == h, (algo, block_size)


def test_file_digest(tmp_path):
    p = tmp_path / "payload.bin"
    payload = b"rsgislib_ray" * 5000
    p.write_bytes(payload)
    for algo in ("md5", "sha256", "blake2b"):
        assert (
            file_digest(str(p), algo)
            == HASH_ALGOS[algo](payload).hexdigest()
        )


def test_text_digest_utf8():
    """text_digest hashes the UTF-8 bytes — same as the reference
    hashing a file containing that text."""
    s = "héllo wörld ☃ ünïcode"
    assert text_digest(s, "sha256") == hashlib.sha256(
        s.encode("utf-8")
    ).hexdigest()


def test_base64_roundtrip():
    for s in ["", "abc", "héllo wörld ☃", "a" * 10_001]:
        enc = encode_base64_text(s)
        assert enc.isascii()
        assert decode_base64_text(enc) == s
    # reference parity: encode is b64encode of the UTF-8 bytes
    import base64

    assert encode_base64_text("pass:word") == base64.b64encode(
        b"pass:word"
    ).decode()
