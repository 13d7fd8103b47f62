"""Keccak-256 / SHA3-256 circuit gadget (reference std/hash/sha3).

Lanes are 64-bit LSB-first bit lists; rho/pi are free reindexings,
theta/chi/iota cost xor/and gates. Verified against the host
implementation in gnark_tpu.utils.keccak (which matches the known
Keccak-256 vectors).
"""

from __future__ import annotations

from gnark_tpu.utils.keccak import _RC, _ROT


def _xor(api, a, b):
    return [api.xor(x, y) for x, y in zip(a, b)]


def _rotl(lane, n):
    n %= 64
    # rotate left: output bit i = input bit (i - n) mod 64
    return [lane[(i - n) % 64] for i in range(64)]


def keccak_f(api, state):
    """state: 5x5 list of 64-bit lanes (bit lists). In-place-free."""
    A = [[list(state[x][y]) for y in range(5)] for x in range(5)]
    for rc in _RC:
        # theta
        C = []
        for x in range(5):
            acc = A[x][0]
            for y in range(1, 5):
                acc = _xor(api, acc, A[x][y])
            C.append(acc)
        D = [_xor(api, C[(x - 1) % 5], _rotl(C[(x + 1) % 5], 1))
             for x in range(5)]
        for x in range(5):
            for y in range(5):
                A[x][y] = _xor(api, A[x][y], D[x])
        # rho + pi
        B = [[None] * 5 for _ in range(5)]
        for x in range(5):
            for y in range(5):
                B[y][(2 * x + 3 * y) % 5] = _rotl(A[x][y], _ROT[x][y])
        # chi: a ^ (~b & c)
        for x in range(5):
            for y in range(5):
                nb = B[(x + 1) % 5][y]
                c = B[(x + 2) % 5][y]
                A[x][y] = [
                    api.xor(B[x][y][i],
                            api.and_(api.sub(1, nb[i]), c[i]))
                    for i in range(64)]
        # iota
        for i in range(64):
            if (rc >> i) & 1:
                A[0][0][i] = api.sub(1, A[0][0][i])
    return A


def _absorb_digest(api, blocks, domain_unused):
    state = [[[0] * 64 for _ in range(5)] for _ in range(5)]
    for block in blocks:        # block: 17 lanes (136-byte rate)
        for idx, lane in enumerate(block):
            x, y = idx % 5, idx // 5
            state[x][y] = _xor(api, state[x][y], lane)
        state = keccak_f(api, state)
    # squeeze 256 bits = lanes (0,0),(1,0),(2,0),(3,0)
    out = []
    for i in range(4):
        out.append(state[i % 5][i // 5])
    return out


def keccak256_of_lanes(api, blocks):
    """blocks: list of 17-lane blocks, each lane a 64-bit variable.
    The caller pre-pads (legacy 0x01 padding; see
    utils.keccak.keccak256). Returns 4 digest lane variables."""
    bit_blocks = []
    for blk in blocks:
        assert len(blk) == 17
        bit_blocks.append([api.to_binary(v, 64) for v in blk])
    lanes = _absorb_digest(api, bit_blocks, None)
    return [api.from_binary(lane) for lane in lanes]


def pad_keccak_lanes(msg: bytes):
    """Host-side legacy-keccak padding -> list of 17-lane int blocks."""
    rate = 136
    padded = bytearray(msg)
    pad_len = rate - (len(padded) % rate)
    if pad_len == 1:
        padded += b"\x81"
    else:
        padded += b"\x01" + b"\x00" * (pad_len - 2) + b"\x80"
    blocks = []
    for off in range(0, len(padded), rate):
        blocks.append([
            int.from_bytes(padded[off + 8 * i: off + 8 * i + 8], "little")
            for i in range(17)])
    return blocks
