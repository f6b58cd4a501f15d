"""Checksum / encoding utilities mirroring the reference's tools
surface (reference python/rsgislib/tools/filetools.py:1000-1330
create_sha1/sha224/sha256/sha384/sha512/md5/blake2b/blake2s/
sha3_224/sha3_256/sha3_384/sha3_512_hash and
python/rsgislib/tools/utils.py:1207,1223 encode/decode_base64_text).

The reference functions stream a FILE through hashlib in
``block_size`` chunks; the digest of a byte stream is independent of
the chunking, so :func:`stream_digest` reproduces the block-read loop
verbatim while :func:`text_digest` is the same hashlib call over an
in-memory payload (the engine's unit of work is a document row, not a
file). Both paths are covered by tests/test_digests.py against
one-shot hashlib and fixed known-answer vectors.
"""

from __future__ import annotations

import base64
import hashlib
from typing import BinaryIO

# the full constructor family the reference's filetools wraps, keyed
# by the reference function suffix (create_<key>_hash)
HASH_ALGOS = {
    "md5": hashlib.md5,
    "sha1": hashlib.sha1,
    "sha224": hashlib.sha224,
    "sha256": hashlib.sha256,
    "sha384": hashlib.sha384,
    "sha512": hashlib.sha512,
    "blake2b": hashlib.blake2b,
    "blake2s": hashlib.blake2s,
    "sha3_224": hashlib.sha3_224,
    "sha3_256": hashlib.sha3_256,
    "sha3_384": hashlib.sha3_384,
    "sha3_512": hashlib.sha3_512,
}


def stream_digest(fobj: BinaryIO, algo: str, block_size: int = 4096) -> str:
    """The reference's block-read loop (filetools.py:1050-1058):
    update the hash object one ``block_size`` chunk at a time and
    return the hex digest."""
    h = HASH_ALGOS[algo]()
    for chunk in iter(lambda: fobj.read(block_size), b""):
        h.update(chunk)
    return h.hexdigest()


def file_digest(path: str, algo: str, block_size: int = 4096) -> str:
    """create_<algo>_hash(input_file, block_size) parity."""
    with open(path, "rb") as f:
        return stream_digest(f, algo, block_size)


def text_digest(text: str, algo: str) -> str:
    """Digest of a UTF-8 text payload (one-shot; identical to the
    block loop over the same bytes)."""
    h = HASH_ALGOS[algo]()
    h.update(text.encode("utf-8"))
    return h.hexdigest()


def encode_base64_text(plain_txt: str) -> str:
    """tools/utils.py:1207 — base64-encode UTF-8 text, returned as
    an ASCII string."""
    return base64.b64encode(plain_txt.encode()).decode()


def decode_base64_text(in_encoded_txt: str) -> str:
    """tools/utils.py:1223 — inverse of :func:`encode_base64_text`."""
    return base64.b64decode(in_encoded_txt.encode()).decode()
