"""RIPEMD-160 circuit gadget (reference std/hash/ripemd160).

Bitcoin-address-style HASH160 workloads. Operates on pre-padded
512-bit blocks of U32 words (little-endian word load, per the spec);
verified against a host implementation in tests."""

from __future__ import annotations

from gnark_tpu.std.math import uints as u

_R1 = [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
       7, 4, 13, 1, 10, 6, 15, 3, 12, 0, 9, 5, 2, 14, 11, 8,
       3, 10, 14, 4, 9, 15, 8, 1, 2, 7, 0, 6, 13, 11, 5, 12,
       1, 9, 11, 10, 0, 8, 12, 4, 13, 3, 7, 15, 14, 5, 6, 2,
       4, 0, 5, 9, 7, 12, 2, 10, 14, 1, 3, 8, 11, 6, 15, 13]
_R2 = [5, 14, 7, 0, 9, 2, 11, 4, 13, 6, 15, 8, 1, 10, 3, 12,
       6, 11, 3, 7, 0, 13, 5, 10, 14, 15, 8, 12, 4, 9, 1, 2,
       15, 5, 1, 3, 7, 14, 6, 9, 11, 8, 12, 2, 10, 0, 4, 13,
       8, 6, 4, 1, 3, 11, 15, 0, 5, 12, 2, 13, 9, 7, 10, 14,
       12, 15, 10, 4, 1, 5, 8, 7, 6, 2, 13, 14, 0, 3, 9, 11]
_S1 = [11, 14, 15, 12, 5, 8, 7, 9, 11, 13, 14, 15, 6, 7, 9, 8,
       7, 6, 8, 13, 11, 9, 7, 15, 7, 12, 15, 9, 11, 7, 13, 12,
       11, 13, 6, 7, 14, 9, 13, 15, 14, 8, 13, 6, 5, 12, 7, 5,
       11, 12, 14, 15, 14, 15, 9, 8, 9, 14, 5, 6, 8, 6, 5, 12,
       9, 15, 5, 11, 6, 8, 13, 12, 5, 12, 13, 14, 11, 8, 5, 6]
_S2 = [8, 9, 9, 11, 13, 15, 15, 5, 7, 7, 8, 11, 14, 14, 12, 6,
       9, 13, 15, 7, 12, 8, 9, 11, 7, 7, 12, 7, 6, 15, 13, 11,
       9, 7, 15, 11, 8, 6, 6, 14, 12, 13, 5, 14, 13, 13, 7, 5,
       15, 5, 8, 11, 14, 14, 6, 14, 6, 9, 12, 9, 12, 5, 15, 8,
       8, 5, 12, 9, 12, 5, 14, 6, 8, 13, 6, 5, 15, 13, 11, 11]
_K1 = [0x00000000, 0x5a827999, 0x6ed9eba1, 0x8f1bbcdc, 0xa953fd4e]
_K2 = [0x50a28be6, 0x5c4dd124, 0x6d703ef3, 0x7a6d76e9, 0x00000000]
_H0 = [0x67452301, 0xefcdab89, 0x98badcfe, 0x10325476, 0xc3d2e1f0]


def _f(api, j, x, y, z):
    if j < 16:                       # x ^ y ^ z
        return u.xor(api, u.xor(api, x, y), z)
    if j < 32:                       # (x & y) | (~x & z) == ch
        return u.ch(api, x, y, z)
    if j < 48:                       # (x | ~y) ^ z
        return u.xor(api, u.or_(api, x, u.not_(api, y)), z)
    if j < 64:                       # (x & z) | (y & ~z) == ch(z, x, y)
        return u.ch(api, z, x, y)
    return u.xor(api, x, u.or_(api, y, u.not_(api, z)))   # x ^ (y | ~z)


def compress_blocks(api, blocks):
    """blocks: list of 16-element U32 lists (pre-padded, LE words).
    Returns 5 U32 digest words (LE serialization order)."""
    state = [u.from_const(h) for h in _H0]
    for x in blocks:
        a1, b1, c1, d1, e1 = state
        a2, b2, c2, d2, e2 = state
        for j in range(80):
            t = u.add(api, a1, _f(api, j, b1, c1, d1), x[_R1[j]],
                      u.from_const(_K1[j // 16]))
            t = u.add(api, u.rotl(t, _S1[j]), e1)
            a1, e1, d1, c1, b1 = e1, d1, u.rotl(c1, 10), b1, t
            t = u.add(api, a2, _f(api, 79 - j, b2, c2, d2), x[_R2[j]],
                      u.from_const(_K2[j // 16]))
            t = u.add(api, u.rotl(t, _S2[j]), e2)
            a2, e2, d2, c2, b2 = e2, d2, u.rotl(c2, 10), b2, t
        h0, h1, h2, h3, h4 = state
        state = [u.add(api, h1, c1, d2),
                 u.add(api, h2, d1, e2),
                 u.add(api, h3, e1, a2),
                 u.add(api, h4, a1, b2),
                 u.add(api, h0, b1, c2)]
    return state


def pad_message(msg: bytes) -> list:
    """Host padding -> constant U32 blocks (LE words, MD4-style)."""
    ln = len(msg) * 8
    msg = msg + b"\x80"
    while (len(msg) + 8) % 64:
        msg += b"\x00"
    msg += ln.to_bytes(8, "little")
    blocks = []
    for off in range(0, len(msg), 64):
        blocks.append([u.from_const(
            int.from_bytes(msg[off + 4 * i:off + 4 * i + 4], "little"))
            for i in range(16)])
    return blocks


def ripemd160_host(msg: bytes) -> bytes:
    """Pure-python reference (hashlib's ripemd160 is often absent from
    OpenSSL builds)."""
    h = list(_H0)
    ln = len(msg) * 8
    m = msg + b"\x80"
    while (len(m) + 8) % 64:
        m += b"\x00"
    m += ln.to_bytes(8, "little")
    M32 = 0xFFFFFFFF

    def rol(v, s):
        return ((v << s) | (v >> (32 - s))) & M32

    def f(j, x, y, z):
        if j < 16:
            return x ^ y ^ z
        if j < 32:
            return (x & y) | (~x & z)
        if j < 48:
            return (x | ~y) ^ z
        if j < 64:
            return (x & z) | (y & ~z)
        return x ^ (y | ~z)

    for off in range(0, len(m), 64):
        x = [int.from_bytes(m[off + 4 * i:off + 4 * i + 4], "little")
             for i in range(16)]
        a1, b1, c1, d1, e1 = h
        a2, b2, c2, d2, e2 = h
        for j in range(80):
            t = (rol((a1 + f(j, b1, c1, d1) + x[_R1[j]] + _K1[j // 16])
                     & M32, _S1[j]) + e1) & M32
            a1, e1, d1, c1, b1 = e1, d1, rol(c1, 10), b1, t
            t = (rol((a2 + f(79 - j, b2, c2, d2) + x[_R2[j]]
                      + _K2[j // 16]) & M32, _S2[j]) + e2) & M32
            a2, e2, d2, c2, b2 = e2, d2, rol(c2, 10), b2, t
        h = [(h[1] + c1 + d2) & M32, (h[2] + d1 + e2) & M32,
             (h[3] + e1 + a2) & M32, (h[4] + a1 + b2) & M32,
             (h[0] + b1 + c2) & M32]
    return b"".join(v.to_bytes(4, "little") for v in h)
