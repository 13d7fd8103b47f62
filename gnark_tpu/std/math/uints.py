"""Unsigned integer circuit API (reference std/math/uints: U8/U32/U64).

Values are little-endian bit lists (circuit booleans); bitwise ops are
per-bit gates, rotations/shifts are free reindexings, and modular
addition goes through one binary decomposition. (The reference's
lookup-table byte representation is an optimization we can switch to
now that logderiv lookups exist; bit representation keeps this
simple and field-generic.)
"""

from __future__ import annotations


class UInt:
    """Width-generic unsigned word as LSB-first circuit bits."""

    WIDTH: int | None = None      # subclasses pin a width

    __slots__ = ("bits",)

    def __init__(self, bits):
        if self.WIDTH is not None:
            assert len(bits) == self.WIDTH
        self.bits = list(bits)

    @property
    def width(self) -> int:
        return len(self.bits)


class U8(UInt):
    WIDTH = 8


class U32(UInt):
    WIDTH = 32


class U64(UInt):
    WIDTH = 64


def _mk(like: UInt, bits):
    return type(like)(bits)


def from_var(api, v, cls=U32):
    return cls(api.to_binary(v, cls.WIDTH))


def from_const(c: int, cls=U32):
    return cls([(c >> i) & 1 for i in range(cls.WIDTH)])


def to_var(api, w: UInt):
    return api.from_binary(w.bits)


def xor(api, a: UInt, b: UInt) -> UInt:
    return _mk(a, [api.xor(x, y) for x, y in zip(a.bits, b.bits)])


def and_(api, a: UInt, b: UInt) -> UInt:
    return _mk(a, [api.and_(x, y) for x, y in zip(a.bits, b.bits)])


def or_(api, a: UInt, b: UInt) -> UInt:
    return _mk(a, [api.or_(x, y) for x, y in zip(a.bits, b.bits)])


def not_(api, a: UInt) -> UInt:
    return _mk(a, [api.sub(1, x) for x in a.bits])


def rotr(a: UInt, n: int) -> UInt:
    w = a.width
    n %= w
    return _mk(a, [a.bits[(i + n) % w] for i in range(w)])


def rotl(a: UInt, n: int) -> UInt:
    return rotr(a, a.width - (n % a.width))


def shr(a: UInt, n: int) -> UInt:
    w = a.width
    return _mk(a, [(a.bits[i + n] if i + n < w else 0) for i in range(w)])


def shl(a: UInt, n: int) -> UInt:
    w = a.width
    return _mk(a, [(a.bits[i - n] if i - n >= 0 else 0) for i in range(w)])


def add(api, *words: UInt) -> UInt:
    """Sum mod 2^w: one linear combination + one decomposition."""
    w = words[0].width
    total = 0
    for x in words:
        total = api.add(total, api.from_binary(x.bits))
    import math
    extra = max(1, math.ceil(math.log2(max(len(words), 2))))
    bits = api.to_binary(total, w + extra)
    return _mk(words[0], bits[:w])


def ch(api, x: UInt, y: UInt, z: UInt) -> UInt:
    """x&y ^ ~x&z == z ^ x&(y^z) (one gate per bit)."""
    return xor(api, z, and_(api, x, xor(api, y, z)))


def maj(api, x: UInt, y: UInt, z: UInt) -> UInt:
    """majority == x&y ^ x&z ^ y&z == (x&y) | ((x^y)&z)."""
    t = and_(api, xor(api, x, y), z)
    return xor(api, and_(api, x, y), t)


def u8s_from_u32(w: U32) -> list:
    """Big-endian byte split (free)."""
    return [U8(w.bits[24:32]), U8(w.bits[16:24]),
            U8(w.bits[8:16]), U8(w.bits[0:8])]


def u32_from_u8s(b3, b2, b1, b0) -> U32:
    """U32 from big-endian bytes (free)."""
    return U32(b0.bits + b1.bits + b2.bits + b3.bits)
