"""SHA-256 circuit gadget (reference std/hash/sha2).

Operates on pre-padded 512-bit blocks of U32 words (the caller supplies
whole blocks, like the reference's sha2 gadget handles padding at the
byte API level — a byte-stream wrapper can sit on top). Verified
against hashlib.sha256 in tests.
"""

from __future__ import annotations

from gnark_tpu.std.math import uints as u

_K = [
    0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5, 0x3956c25b, 0x59f111f1,
    0x923f82a4, 0xab1c5ed5, 0xd807aa98, 0x12835b01, 0x243185be, 0x550c7dc3,
    0x72be5d74, 0x80deb1fe, 0x9bdc06a7, 0xc19bf174, 0xe49b69c1, 0xefbe4786,
    0x0fc19dc6, 0x240ca1cc, 0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da,
    0x983e5152, 0xa831c66d, 0xb00327c8, 0xbf597fc7, 0xc6e00bf3, 0xd5a79147,
    0x06ca6351, 0x14292967, 0x27b70a85, 0x2e1b2138, 0x4d2c6dfc, 0x53380d13,
    0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85, 0xa2bfe8a1, 0xa81a664b,
    0xc24b8b70, 0xc76c51a3, 0xd192e819, 0xd6990624, 0xf40e3585, 0x106aa070,
    0x19a4c116, 0x1e376c08, 0x2748774c, 0x34b0bcb5, 0x391c0cb3, 0x4ed8aa4a,
    0x5b9cca4f, 0x682e6ff3, 0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
    0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2,
]

_H0 = [0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
       0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19]


def _sigma0(api, x):
    return u.xor(api, u.xor(api, u.rotr(x, 7), u.rotr(x, 18)), u.shr(x, 3))


def _sigma1(api, x):
    return u.xor(api, u.xor(api, u.rotr(x, 17), u.rotr(x, 19)), u.shr(x, 10))


def _Sigma0(api, x):
    return u.xor(api, u.xor(api, u.rotr(x, 2), u.rotr(x, 13)), u.rotr(x, 22))


def _Sigma1(api, x):
    return u.xor(api, u.xor(api, u.rotr(x, 6), u.rotr(x, 11)), u.rotr(x, 25))


def compress_blocks(api, blocks):
    """blocks: list of 16-element lists of U32 (pre-padded message).
    Returns 8 U32 digest words."""
    state = [u.from_const(h) for h in _H0]
    for block in blocks:
        assert len(block) == 16
        w = list(block)
        for t in range(16, 64):
            w.append(u.add(api, _sigma1(api, w[t - 2]), w[t - 7],
                           _sigma0(api, w[t - 15]), w[t - 16]))
        a, b, c, d, e, f, g, h = state
        for t in range(64):
            t1 = u.add(api, h, _Sigma1(api, e), u.ch(api, e, f, g),
                       u.from_const(_K[t]), w[t])
            t2 = u.add(api, _Sigma0(api, a), u.maj(api, a, b, c))
            h, g, f = g, f, e
            e = u.add(api, d, t1)
            d, c, b = c, b, a
            a = u.add(api, t1, t2)
        state = [u.add(api, s, v)
                 for s, v in zip(state, [a, b, c, d, e, f, g, h])]
    return state


def pad_message_words(msg: bytes):
    """Host-side sha256 padding -> list of 16-word blocks (ints)."""
    ml = len(msg) * 8
    msg = msg + b"\x80"
    while (len(msg) + 8) % 64:
        msg += b"\x00"
    msg += ml.to_bytes(8, "big")
    blocks = []
    for off in range(0, len(msg), 64):
        blocks.append([int.from_bytes(msg[off + 4 * i: off + 4 * i + 4],
                                      "big") for i in range(16)])
    return blocks


def sha256_of_words(api, blocks_of_vars):
    """blocks_of_vars: list of 16-var blocks (each a 32-bit variable).
    Returns 8 digest word variables."""
    blocks = [[u.from_var(api, v) for v in blk] for blk in blocks_of_vars]
    return [u.to_var(api, w) for w in compress_blocks(api, blocks)]
