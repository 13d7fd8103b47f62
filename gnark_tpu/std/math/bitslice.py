"""Bit-slicing gadgets (reference std/math/bitslice): partition a value
into low/high parts at a bit position, with width constraints."""

from __future__ import annotations


def partition(api, v, split: int, total_bits: int):
    """v == lo + 2^split * hi with lo < 2^split, hi < 2^(total-split).
    Returns (lo, hi)."""
    assert 0 <= split <= total_bits
    bits = api.to_binary(v, total_bits)
    lo = api.from_binary(bits[:split]) if split else 0
    hi = api.from_binary(bits[split:]) if split < total_bits else 0
    return lo, hi
