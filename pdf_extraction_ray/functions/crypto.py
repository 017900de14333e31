"""Minimal stdlib crypto for the PDF standard security handler
(round-5: RC4-128 and AES-128-CBC, PDF 32000-1 §7.6.2-7.6.3).

Pure-python implementations of two public algorithms — RC4 (Rivest
1987, as published) and AES-128 (FIPS-197). The S-box is COMPUTED from
the GF(2^8) definition rather than transcribed, and the FIPS-197
Appendix C vector is pinned in tests/test_pdf_encryption.py. Speed is
irrelevant here: the engine encrypts/decrypts fixture corpora, not
bulk data (a deployment would swap in ``cryptography`` via the same
capability-probe pattern as functions/imaging.py).
"""

from __future__ import annotations


def rc4(key: bytes, data: bytes) -> bytes:
    """RC4 stream cipher (symmetric: same call encrypts and decrypts)."""
    S = list(range(256))
    j = 0
    for i in range(256):
        j = (j + S[i] + key[i % len(key)]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for k, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[k] = c ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


def _build_tables():
    """GF(2^8) exp/log (generator 3, modulus 0x11B) -> S-box via the
    FIPS-197 affine transform; inverse S-box by inversion."""
    exp = [0] * 256
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x ^= ((x << 1) & 0xFF) ^ (0x1B if x & 0x80 else 0)   # x *= 3
    exp[255] = exp[0]      # 3^255 = 3^0: inverse of 1 must resolve to 1
    sbox = [0] * 256
    for i in range(256):
        b = 0 if i == 0 else exp[255 - log[i]]               # 1/i
        s = 0x63
        for r in range(5):                                   # affine
            s ^= ((b << r) | (b >> (8 - r))) & 0xFF
        sbox[i] = s
    inv = [0] * 256
    for i, s in enumerate(sbox):
        inv[s] = i
    return exp, log, bytes(sbox), bytes(inv)


_EXP, _LOG, _SBOX, _INV_SBOX = _build_tables()


def _gmul(a: int, b: int) -> int:
    if a == 0 or b == 0:
        return 0
    return _EXP[(_LOG[a] + _LOG[b]) % 255]


_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36]


def _expand_key(key: bytes) -> list:
    """AES-128 key schedule -> 11 round keys of 16 bytes each."""
    w = [list(key[i:i + 4]) for i in range(0, 16, 4)]
    for i in range(4, 44):
        t = list(w[i - 1])
        if i % 4 == 0:
            t = t[1:] + t[:1]                                # RotWord
            t = [_SBOX[b] for b in t]                        # SubWord
            t[0] ^= _RCON[i // 4 - 1]
        w.append([a ^ b for a, b in zip(w[i - 4], t)])
    return [bytes(sum(w[r * 4:r * 4 + 4], [])) for r in range(11)]


def _encrypt_block(rk: list, block: bytes) -> bytes:
    # state is column-major per FIPS-197: s[r][c] = in[r + 4c]
    s = [[block[r + 4 * c] for c in range(4)] for r in range(4)]

    def add_rk(k):
        for c in range(4):
            for r in range(4):
                s[r][c] ^= k[r + 4 * c]

    add_rk(rk[0])
    for rnd in range(1, 11):
        for r in range(4):
            for c in range(4):
                s[r][c] = _SBOX[s[r][c]]                     # SubBytes
        for r in range(1, 4):                                # ShiftRows
            s[r] = s[r][r:] + s[r][:r]
        if rnd < 10:                                         # MixColumns
            for c in range(4):
                a = [s[r][c] for r in range(4)]
                s[0][c] = _gmul(a[0], 2) ^ _gmul(a[1], 3) ^ a[2] ^ a[3]
                s[1][c] = a[0] ^ _gmul(a[1], 2) ^ _gmul(a[2], 3) ^ a[3]
                s[2][c] = a[0] ^ a[1] ^ _gmul(a[2], 2) ^ _gmul(a[3], 3)
                s[3][c] = _gmul(a[0], 3) ^ a[1] ^ a[2] ^ _gmul(a[3], 2)
        add_rk(rk[rnd])
    return bytes(s[r % 4][r // 4] for r in range(16))


def _decrypt_block(rk: list, block: bytes) -> bytes:
    s = [[block[r + 4 * c] for c in range(4)] for r in range(4)]

    def add_rk(k):
        for c in range(4):
            for r in range(4):
                s[r][c] ^= k[r + 4 * c]

    add_rk(rk[10])
    for rnd in range(9, -1, -1):
        for r in range(1, 4):                            # InvShiftRows
            s[r] = s[r][-r:] + s[r][:-r]
        for r in range(4):
            for c in range(4):
                s[r][c] = _INV_SBOX[s[r][c]]             # InvSubBytes
        add_rk(rk[rnd])
        if rnd > 0:                                      # InvMixColumns
            for c in range(4):
                a = [s[r][c] for r in range(4)]
                s[0][c] = _gmul(a[0], 14) ^ _gmul(a[1], 11) \
                    ^ _gmul(a[2], 13) ^ _gmul(a[3], 9)
                s[1][c] = _gmul(a[0], 9) ^ _gmul(a[1], 14) \
                    ^ _gmul(a[2], 11) ^ _gmul(a[3], 13)
                s[2][c] = _gmul(a[0], 13) ^ _gmul(a[1], 9) \
                    ^ _gmul(a[2], 14) ^ _gmul(a[3], 11)
                s[3][c] = _gmul(a[0], 11) ^ _gmul(a[1], 13) \
                    ^ _gmul(a[2], 9) ^ _gmul(a[3], 14)
    return bytes(s[r % 4][r // 4] for r in range(16))


def aes128_encrypt_block(key: bytes, block: bytes) -> bytes:
    return _encrypt_block(_expand_key(key), block)


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """AES-128-CBC with PKCS#7 padding; returns iv + ciphertext (the
    PDF AESV2 stream layout, §7.6.2)."""
    rk = _expand_key(key)
    pad = 16 - len(data) % 16
    data = data + bytes([pad]) * pad
    out = bytearray(iv)
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i:i + 16], prev))
        prev = _encrypt_block(rk, blk)
        out += prev
    return bytes(out)


def aes_cbc_decrypt(key: bytes, data: bytes) -> bytes:
    """Inverse of aes_cbc_encrypt: data = iv + ciphertext."""
    rk = _expand_key(key)
    iv, ct = data[:16], data[16:]
    if len(ct) % 16:
        raise ValueError("AES ciphertext not block-aligned")
    out = bytearray()
    prev = iv
    for i in range(0, len(ct), 16):
        blk = _decrypt_block(rk, ct[i:i + 16])
        out += bytes(a ^ b for a, b in zip(blk, prev))
        prev = ct[i:i + 16]
    if not out:
        return b""
    pad = out[-1]
    if not 1 <= pad <= 16:
        raise ValueError("bad AES padding")
    return bytes(out[:-pad])
