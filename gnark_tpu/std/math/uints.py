"""Unsigned integer circuit API (reference std/math/uints).

U32 values are little-endian bit lists (circuit booleans); bitwise ops
are per-bit gates, rotations/shifts are free reindexings, and modular
addition goes through one binary decomposition. (The reference's
lookup-table byte representation is an optimization we can switch to
now that logderiv lookups exist; bit representation keeps v0 simple.)
"""

from __future__ import annotations


class U32:
    """32-bit word as LSB-first circuit bits."""

    __slots__ = ("bits",)

    def __init__(self, bits):
        assert len(bits) == 32
        self.bits = list(bits)


def from_var(api, v) -> U32:
    return U32(api.to_binary(v, 32))


def from_const(c: int) -> U32:
    return U32([(c >> i) & 1 for i in range(32)])


def to_var(api, w: U32):
    return api.from_binary(w.bits)


def xor(api, a: U32, b: U32) -> U32:
    return U32([api.xor(x, y) for x, y in zip(a.bits, b.bits)])


def and_(api, a: U32, b: U32) -> U32:
    return U32([api.and_(x, y) for x, y in zip(a.bits, b.bits)])


def not_(api, a: U32) -> U32:
    return U32([api.sub(1, x) for x in a.bits])


def rotr(a: U32, n: int) -> U32:
    n %= 32
    return U32([a.bits[(i + n) % 32] for i in range(32)])


def shr(a: U32, n: int) -> U32:
    return U32([(a.bits[i + n] if i + n < 32 else 0) for i in range(32)])


def add(api, *words: U32) -> U32:
    """Sum mod 2^32: one linear combination + one decomposition."""
    total = 0
    for w in words:
        total = api.add(total, api.from_binary(w.bits))
    extra = max(len(words) - 1, 1).bit_length()
    bits = api.to_binary(total, 32 + extra)
    return U32(bits[:32])


def ch(api, x: U32, y: U32, z: U32) -> U32:
    """(x & y) ^ (~x & z) == select(x, y, z) bitwise."""
    return U32([api.select(xb, yb, zb)
                for xb, yb, zb in zip(x.bits, y.bits, z.bits)])


def maj(api, x: U32, y: U32, z: U32) -> U32:
    """majority == select(x, y|z, y&z) bitwise."""
    out = []
    for xb, yb, zb in zip(x.bits, y.bits, z.bits):
        out.append(api.select(xb, api.or_(yb, zb), api.and_(yb, zb)))
    return U32(out)
