"""SHA-512 circuit gadget (reference std/hash/sha2 — the sha2 package
serves SHA-256/384/512; this is the 64-bit-word family member).

Operates on pre-padded 1024-bit blocks of U64 words; verified against
hashlib.sha512 in tests."""

from __future__ import annotations

import hashlib

from gnark_tpu.std.math import uints as u

_K = [
    0x428a2f98d728ae22, 0x7137449123ef65cd, 0xb5c0fbcfec4d3b2f,
    0xe9b5dba58189dbbc, 0x3956c25bf348b538, 0x59f111f1b605d019,
    0x923f82a4af194f9b, 0xab1c5ed5da6d8118, 0xd807aa98a3030242,
    0x12835b0145706fbe, 0x243185be4ee4b28c, 0x550c7dc3d5ffb4e2,
    0x72be5d74f27b896f, 0x80deb1fe3b1696b1, 0x9bdc06a725c71235,
    0xc19bf174cf692694, 0xe49b69c19ef14ad2, 0xefbe4786384f25e3,
    0x0fc19dc68b8cd5b5, 0x240ca1cc77ac9c65, 0x2de92c6f592b0275,
    0x4a7484aa6ea6e483, 0x5cb0a9dcbd41fbd4, 0x76f988da831153b5,
    0x983e5152ee66dfab, 0xa831c66d2db43210, 0xb00327c898fb213f,
    0xbf597fc7beef0ee4, 0xc6e00bf33da88fc2, 0xd5a79147930aa725,
    0x06ca6351e003826f, 0x142929670a0e6e70, 0x27b70a8546d22ffc,
    0x2e1b21385c26c926, 0x4d2c6dfc5ac42aed, 0x53380d139d95b3df,
    0x650a73548baf63de, 0x766a0abb3c77b2a8, 0x81c2c92e47edaee6,
    0x92722c851482353b, 0xa2bfe8a14cf10364, 0xa81a664bbc423001,
    0xc24b8b70d0f89791, 0xc76c51a30654be30, 0xd192e819d6ef5218,
    0xd69906245565a910, 0xf40e35855771202a, 0x106aa07032bbd1b8,
    0x19a4c116b8d2d0c8, 0x1e376c085141ab53, 0x2748774cdf8eeb99,
    0x34b0bcb5e19b48a8, 0x391c0cb3c5c95a63, 0x4ed8aa4ae3418acb,
    0x5b9cca4f7763e373, 0x682e6ff3d6b2b8a3, 0x748f82ee5defb2fc,
    0x78a5636f43172f60, 0x84c87814a1f0ab72, 0x8cc702081a6439ec,
    0x90befffa23631e28, 0xa4506cebde82bde9, 0xbef9a3f7b2c67915,
    0xc67178f2e372532b, 0xca273eceea26619c, 0xd186b8c721c0c207,
    0xeada7dd6cde0eb1e, 0xf57d4f7fee6ed178, 0x06f067aa72176fba,
    0x0a637dc5a2c898a6, 0x113f9804bef90dae, 0x1b710b35131c471b,
    0x28db77f523047d84, 0x32caab7b40c72493, 0x3c9ebe0a15c9bebc,
    0x431d67c49c100d4c, 0x4cc5d4becb3e42b6, 0x597f299cfc657e2a,
    0x5fcb6fab3ad6faec, 0x6c44198c4a475817,
]

_H0 = [0x6a09e667f3bcc908, 0xbb67ae8584caa73b, 0x3c6ef372fe94f82b,
       0xa54ff53a5f1d36f1, 0x510e527fade682d1, 0x9b05688c2b3e6c1f,
       0x1f83d9abfb41bd6b, 0x5be0cd19137e2179]


def _sigma0(api, x):
    return u.xor(api, u.xor(api, u.rotr(x, 1), u.rotr(x, 8)), u.shr(x, 7))


def _sigma1(api, x):
    return u.xor(api, u.xor(api, u.rotr(x, 19), u.rotr(x, 61)),
                 u.shr(x, 6))


def _Sigma0(api, x):
    return u.xor(api, u.xor(api, u.rotr(x, 28), u.rotr(x, 34)),
                 u.rotr(x, 39))


def _Sigma1(api, x):
    return u.xor(api, u.xor(api, u.rotr(x, 14), u.rotr(x, 18)),
                 u.rotr(x, 41))


def compress_blocks(api, blocks):
    """blocks: list of 16-element lists of U64 (pre-padded message).
    Returns 8 U64 digest words."""
    state = [u.from_const(h, u.U64) for h in _H0]
    for block in blocks:
        w = list(block)
        for t in range(16, 80):
            w.append(u.add(api, _sigma1(api, w[t - 2]), w[t - 7],
                           _sigma0(api, w[t - 15]), w[t - 16]))
        a, b, c, d, e, f, g, h = state
        for t in range(80):
            t1 = u.add(api, h, _Sigma1(api, e), u.ch(api, e, f, g),
                       u.from_const(_K[t], u.U64), w[t])
            t2 = u.add(api, _Sigma0(api, a), u.maj(api, a, b, c))
            h, g, f = g, f, e
            e = u.add(api, d, t1)
            d, c, b = c, b, a
            a = u.add(api, t1, t2)
        state = [u.add(api, s, v) for s, v in
                 zip(state, [a, b, c, d, e, f, g, h])]
    return state


def pad_message(msg: bytes) -> list:
    """Host-side SHA-512 padding -> list of 16xU64-constant blocks
    (for tests / constant inputs)."""
    ln = len(msg) * 8
    msg = msg + b"\x80"
    while (len(msg) + 16) % 128:
        msg += b"\x00"
    msg += ln.to_bytes(16, "big")
    blocks = []
    for off in range(0, len(msg), 128):
        blocks.append([u.from_const(
            int.from_bytes(msg[off + 8 * i:off + 8 * i + 8], "big"),
            u.U64) for i in range(16)])
    return blocks


def sha512_host(msg: bytes) -> bytes:
    return hashlib.sha512(msg).digest()
