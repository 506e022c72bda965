"""From-scratch AES / Fernet / .arch session files — spec-vector pinned.

The cipher stack exists to read and write the reference's encrypted
session files without the ``cryptography`` package: AES-128 is pinned by
FIPS-197 C.1 and NIST SP 800-38A known-answer vectors, the Fernet layer
by the fernet-spec repository's published verification vector (decrypt
AND byte-identical mint), and the ``.arch`` layer by the reference's
key-derivation and error-message contract
(app_session_manager.py:54-64,140-158,174-201).
"""

import base64

import pytest

from archvisier_spark.kernel.aes import (
    cbc_decrypt,
    cbc_encrypt,
    decrypt_block,
    encrypt_block,
    pkcs7_pad,
    pkcs7_unpad,
)
from archvisier_spark.kernel.fernet import InvalidToken, decrypt, encrypt
from archvisier_spark.kernel.session_file import (
    MSG_BAD_HEADER,
    MSG_BAD_PASSWORD,
    MSG_NEEDS_PASSWORD,
    derive_machine_key,
    derive_password_key,
    load_session,
    save_session,
)

# --- AES known-answer vectors -------------------------------------------

FIPS_KEY = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
FIPS_PT = bytes.fromhex("00112233445566778899aabbccddeeff")
FIPS_CT = bytes.fromhex("69c4e0d86a7b0430d8cdb78070b4c55a")


def test_aes_fips197_c1_vector():
    assert encrypt_block(FIPS_PT, FIPS_KEY) == FIPS_CT
    assert decrypt_block(FIPS_CT, FIPS_KEY) == FIPS_PT


def test_aes_nist_sp800_38a_cbc_vector():
    key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    iv = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex(
        "6bc1bee22e409f96e93d7e117393172a"
        "ae2d8a571e03ac9c9eb76fac45af8e51"
    )
    ct = bytes.fromhex(
        "7649abac8119b246cee98e9b12e9197d"
        "5086cb9b507219ee95db113a917678b2"
    )
    assert cbc_encrypt(pt, key, iv) == ct
    assert cbc_decrypt(ct, key, iv) == pt


def test_pkcs7_roundtrip_and_rejects():
    for n in range(0, 33):
        data = bytes(range(n % 256))[:n]
        assert pkcs7_unpad(pkcs7_pad(data)) == data
    with pytest.raises(ValueError):
        pkcs7_unpad(b"\x00" * 16)  # pad byte 0 is invalid
    with pytest.raises(ValueError):
        pkcs7_unpad(b"abc")  # not block-aligned


# --- Fernet spec vectors -------------------------------------------------

SPEC_SECRET = "cw_0x689RpI-jtRR7oE8h_eQsKImvJapLeSbXpwF4e4="
SPEC_TOKEN = (
    "gAAAAAAdwJ6wAAECAwQFBgcICQoLDA0ODy021cpGVWKZ_eEwCGM4BLLF"
    "_5CV9dOPmrhuVUPgJobwOz7JcbmrR64jVmpU4IwqDA=="
)


def test_fernet_spec_verify_vector():
    assert decrypt(SPEC_SECRET, SPEC_TOKEN, ttl=60,
                   current_time=499162802) == b"hello"


def test_fernet_spec_generate_vector_byte_identical():
    """Minting with the spec's timestamp + IV must reproduce the spec's
    token byte for byte — this is the cryptography-interop proof."""
    minted = encrypt(SPEC_SECRET, b"hello", current_time=499162800,
                     iv=bytes(range(16)))
    assert minted.decode() == SPEC_TOKEN


def test_fernet_tamper_and_expiry():
    key = base64.urlsafe_b64encode(bytes(32))
    token = encrypt(key, b"payload", current_time=1000)
    assert decrypt(key, token) == b"payload"
    raw = bytearray(base64.urlsafe_b64decode(token))
    raw[30] ^= 0x01
    with pytest.raises(InvalidToken):
        decrypt(key, base64.urlsafe_b64encode(bytes(raw)))
    with pytest.raises(InvalidToken):
        decrypt(key, token, ttl=60, current_time=2000)  # expired
    with pytest.raises(InvalidToken):
        decrypt(key, token, ttl=60, current_time=500)  # future skew > 60 s
    with pytest.raises(ValueError):
        # malformed KEY is a ValueError (cryptography's contract), not
        # an InvalidToken — the token never gets examined
        decrypt(base64.urlsafe_b64encode(bytes(31)), token)

def test_fernet_wrong_key_rejects():
    k1 = base64.urlsafe_b64encode(bytes(32))
    k2 = base64.urlsafe_b64encode(bytes([1]) + bytes(31))
    with pytest.raises(InvalidToken):
        decrypt(k2, encrypt(k1, b"x"))


# --- .arch session files -------------------------------------------------

def test_session_roundtrip_machine_key(tmp_path):
    data = {"session_id": "s1", "work_mode": "KP",
            "counters": {"KP": 7}, "files_data": [{"values": ["zażółć"]}]}
    path = str(tmp_path / "s.arch")
    save_session(path, data, machine_info="HOSTuser")
    ok, loaded = load_session(path, machine_info="HOSTuser")
    assert ok and loaded == data
    # a different machine cannot open it and gets the reference's
    # password-prompt message (the decrypt-failed-without-password path)
    ok, msg = load_session(path, machine_info="OTHERbox")
    assert (ok, msg) == (False, MSG_NEEDS_PASSWORD)


def test_session_roundtrip_password_key(tmp_path):
    path = str(tmp_path / "p.arch")
    save_session(path, {"x": 1}, password="tajne")
    ok, loaded = load_session(path, password="tajne")
    assert ok and loaded == {"x": 1}
    ok, msg = load_session(path, password="złe")
    assert (ok, msg) == (False, MSG_BAD_PASSWORD)


def test_session_header_check(tmp_path):
    path = str(tmp_path / "bad.arch")
    with open(path, "wb") as f:
        f.write(b"NOT_A_SESSION\n1234")
    ok, msg = load_session(path)
    assert (ok, msg) == (False, MSG_BAD_HEADER)


def test_reference_key_derivations_exact():
    """Byte-exact parity with app_session_manager.py:54-64,145-147."""
    import base64 as b64
    import hashlib

    info = "PCjan"
    expected = b64.urlsafe_b64encode(
        hashlib.sha256((info + "ArchiwizatorIGG_v3.2_2025").encode()).digest()
    )
    assert derive_machine_key(info) == expected
    half = hashlib.sha256(b"haslo").digest()[:16]
    assert derive_password_key("haslo") == b64.urlsafe_b64encode(half + half)
