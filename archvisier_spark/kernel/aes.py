"""From-scratch AES-128 + CBC + PKCS#7 — pure stdlib, spec-derived.

The reference encrypts session files with Fernet
(app_session_manager.py:54-64), whose cipher layer is AES-128-CBC.  The
``cryptography`` package is absent in this sandbox, and AES (FIPS-197)
is a public specification — so the primitive is implemented here from
the spec, with the S-box GENERATED from its mathematical definition
(multiplicative inverse in GF(2^8) followed by the affine transform)
instead of a hand-typed table, and pinned by the FIPS-197 C.1 and NIST
SP 800-38A known-answer vectors in tests/test_kernel_fernet.py.

Performance is irrelevant here (session blobs are kilobytes, encrypted
once on the driver); correctness is carried entirely by the published
test vectors.
"""

from __future__ import annotations

BLOCK = 16


def _gmul(a: int, b: int) -> int:
    """Multiplication in GF(2^8) modulo the AES polynomial x^8+x^4+x^3+x+1."""
    out = 0
    for _ in range(8):
        if b & 1:
            out ^= a
        hi = a & 0x80
        a = (a << 1) & 0xFF
        if hi:
            a ^= 0x1B
        b >>= 1
    return out


def _build_sbox() -> tuple[bytes, bytes]:
    """S-box from the spec's definition: byte inverse then affine map
    b ^ rot(b,1) ^ rot(b,2) ^ rot(b,3) ^ rot(b,4) ^ 0x63."""
    # multiplicative inverses via brute force (256×256 once at import)
    inv = [0] * 256
    for x in range(1, 256):
        if inv[x]:
            continue
        for y in range(1, 256):
            if _gmul(x, y) == 1:
                inv[x], inv[y] = y, x
                break
    sbox = bytearray(256)
    for x in range(256):
        b = inv[x]
        r = b
        for shift in (1, 2, 3, 4):
            r ^= ((b << shift) | (b >> (8 - shift))) & 0xFF
        sbox[x] = r ^ 0x63
    inv_sbox = bytearray(256)
    for i, v in enumerate(sbox):
        inv_sbox[v] = i
    return bytes(sbox), bytes(inv_sbox)


_SBOX, _INV_SBOX = _build_sbox()
assert _SBOX[0x00] == 0x63 and _SBOX[0x01] == 0x7C and _SBOX[0x53] == 0xED

_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36]


def _expand_key(key: bytes) -> list[bytes]:
    """AES-128 key schedule → 11 round keys of 16 bytes."""
    if len(key) != 16:
        raise ValueError("AES-128 requires a 16-byte key")
    words = [key[i:i + 4] for i in range(0, 16, 4)]
    for i in range(4, 44):
        temp = words[i - 1]
        if i % 4 == 0:
            rotated = temp[1:] + temp[:1]
            temp = bytes(_SBOX[b] for b in rotated)
            temp = bytes([temp[0] ^ _RCON[i // 4 - 1], *temp[1:]])
        words.append(bytes(a ^ b for a, b in zip(words[i - 4], temp)))
    return [b"".join(words[4 * r:4 * r + 4]) for r in range(11)]


def _add_round_key(state: bytearray, rk: bytes) -> None:
    for i in range(16):
        state[i] ^= rk[i]


def _shift_rows(state: bytearray, inverse: bool = False) -> None:
    # state is column-major: byte (row, col) at index col*4 + row
    for row in range(1, 4):
        vals = [state[col * 4 + row] for col in range(4)]
        shift = -row if inverse else row
        vals = vals[shift % 4:] + vals[:shift % 4]
        for col in range(4):
            state[col * 4 + row] = vals[col]


def _mix_columns(state: bytearray, inverse: bool = False) -> None:
    coef = (0x0E, 0x0B, 0x0D, 0x09) if inverse else (0x02, 0x03, 0x01, 0x01)
    for col in range(4):
        a = state[col * 4:col * 4 + 4]
        for row in range(4):
            state[col * 4 + row] = (
                _gmul(a[0], coef[(0 - row) % 4])
                ^ _gmul(a[1], coef[(1 - row) % 4])
                ^ _gmul(a[2], coef[(2 - row) % 4])
                ^ _gmul(a[3], coef[(3 - row) % 4])
            )


def encrypt_block(block: bytes, key: bytes) -> bytes:
    rks = _expand_key(key)
    state = bytearray(block)
    _add_round_key(state, rks[0])
    for rnd in range(1, 10):
        for i in range(16):
            state[i] = _SBOX[state[i]]
        _shift_rows(state)
        _mix_columns(state)
        _add_round_key(state, rks[rnd])
    for i in range(16):
        state[i] = _SBOX[state[i]]
    _shift_rows(state)
    _add_round_key(state, rks[10])
    return bytes(state)


def decrypt_block(block: bytes, key: bytes) -> bytes:
    rks = _expand_key(key)
    state = bytearray(block)
    _add_round_key(state, rks[10])
    _shift_rows(state, inverse=True)
    for i in range(16):
        state[i] = _INV_SBOX[state[i]]
    for rnd in range(9, 0, -1):
        _add_round_key(state, rks[rnd])
        _mix_columns(state, inverse=True)
        _shift_rows(state, inverse=True)
        for i in range(16):
            state[i] = _INV_SBOX[state[i]]
    _add_round_key(state, rks[0])
    return bytes(state)


def pkcs7_pad(data: bytes) -> bytes:
    pad = BLOCK - len(data) % BLOCK
    return data + bytes([pad]) * pad


def pkcs7_unpad(data: bytes) -> bytes:
    if not data or len(data) % BLOCK:
        raise ValueError("invalid padded length")
    pad = data[-1]
    if not 1 <= pad <= BLOCK or data[-pad:] != bytes([pad]) * pad:
        raise ValueError("invalid PKCS#7 padding")
    return data[:-pad]


def cbc_encrypt(data: bytes, key: bytes, iv: bytes) -> bytes:
    """CBC over already-padded data."""
    if len(data) % BLOCK:
        raise ValueError("CBC input must be block-aligned (pad first)")
    out = bytearray()
    prev = iv
    for i in range(0, len(data), BLOCK):
        block = bytes(a ^ b for a, b in zip(data[i:i + BLOCK], prev))
        prev = encrypt_block(block, key)
        out += prev
    return bytes(out)


def cbc_decrypt(data: bytes, key: bytes, iv: bytes) -> bytes:
    if len(data) % BLOCK:
        raise ValueError("CBC ciphertext must be block-aligned")
    out = bytearray()
    prev = iv
    for i in range(0, len(data), BLOCK):
        block = data[i:i + BLOCK]
        out += bytes(a ^ b for a, b in zip(decrypt_block(block, key), prev))
        prev = block
    return bytes(out)
