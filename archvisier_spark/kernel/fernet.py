"""Fernet tokens (the public fernet-spec) over the from-scratch AES.

The reference's session files are ``cryptography.fernet.Fernet`` blobs
(app_session_manager.py:54-64).  The Fernet format is a published spec
(github.com/fernet/spec): a 32-byte base64url key splits into a signing
half and an encryption half; a token is::

    0x80 || timestamp(8, big-endian) || IV(16) || AES-128-CBC ciphertext
         || HMAC-SHA256(signing_key, everything before the HMAC)

base64url-encoded.  HMAC/SHA-256 come from the stdlib; the cipher is
``kernel/aes.py`` (FIPS-197-pinned).  Byte-compatibility with the
``cryptography`` implementation is asserted against the fernet-spec
repository's published verification vector in
tests/test_kernel_fernet.py — a token minted here decrypts in any
conforming implementation and vice versa, which is what makes the
reference's ``.arch`` session files importable (kernel/session_file.py).
"""

from __future__ import annotations

import base64
import hmac
import os
import struct
import time

from archvisier_spark.kernel.aes import (
    cbc_decrypt,
    cbc_encrypt,
    pkcs7_pad,
    pkcs7_unpad,
)

_VERSION = 0x80


class InvalidToken(Exception):
    """Raised on any verification failure, mirroring cryptography's
    single-exception contract (no oracle about WHAT failed)."""


def generate_key() -> bytes:
    return base64.urlsafe_b64encode(os.urandom(32))


def _split_key(key: bytes | str) -> tuple[bytes, bytes]:
    raw = base64.urlsafe_b64decode(key)
    if len(raw) != 32:
        raise ValueError("Fernet key must decode to 32 bytes")
    return raw[:16], raw[16:]


def encrypt(key: bytes | str, data: bytes,
            current_time: int | None = None, iv: bytes | None = None) -> bytes:
    """Mint a token.  ``current_time``/``iv`` are injectable for the
    spec's deterministic test vectors; production callers omit both."""
    signing_key, enc_key = _split_key(key)
    ts = int(time.time()) if current_time is None else int(current_time)
    iv = os.urandom(16) if iv is None else iv
    if len(iv) != 16:
        raise ValueError("IV must be 16 bytes")
    body = (
        bytes([_VERSION]) + struct.pack(">Q", ts) + iv
        + cbc_encrypt(pkcs7_pad(data), enc_key, iv)
    )
    return base64.urlsafe_b64encode(body + hmac.new(
        signing_key, body, "sha256").digest())


def decrypt(key: bytes | str, token: bytes | str,
            ttl: int | None = None, current_time: int | None = None) -> bytes:
    signing_key, enc_key = _split_key(key)
    if isinstance(token, str):
        token = token.encode("ascii")
    try:
        raw = base64.urlsafe_b64decode(token)
    except Exception as e:
        raise InvalidToken("not base64url") from e
    # 1 version + 8 ts + 16 iv + >=16 ct + 32 hmac
    if len(raw) < 73 or raw[0] != _VERSION:
        raise InvalidToken("bad length or version")
    body, mac = raw[:-32], raw[-32:]
    if not hmac.compare_digest(
        mac, hmac.new(signing_key, body, "sha256").digest()
    ):
        raise InvalidToken("HMAC mismatch")
    (ts,) = struct.unpack(">Q", body[1:9])
    if ttl is not None:
        now = int(time.time()) if current_time is None else int(current_time)
        if ts + ttl < now or ts > now + 60:  # spec: max clock skew 60 s
            raise InvalidToken("expired token")
    iv, ct = body[9:25], body[25:]
    if len(ct) % 16:
        raise InvalidToken("ciphertext not block-aligned")
    try:
        return pkcs7_unpad(cbc_decrypt(ct, enc_key, iv))
    except ValueError as e:
        raise InvalidToken("bad padding") from e
