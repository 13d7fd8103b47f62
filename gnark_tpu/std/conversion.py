"""Byte/bit conversions across field sizes (reference std/conversion).

Bytes are circuit values constrained to [0, 256); endianness follows
the reference (big-endian byte arrays for field elements).
"""

from __future__ import annotations


def to_bytes(api, v, nbytes: int):
    """v -> nbytes big-endian bytes (each constrained to 8 bits)."""
    bits = api.to_binary(v, 8 * nbytes)
    out = []
    for i in range(nbytes):        # big-endian: most significant first
        chunk = bits[8 * (nbytes - 1 - i): 8 * (nbytes - i)]
        out.append(api.from_binary(chunk))
    return out


def from_bytes(api, bts):
    """Big-endian bytes -> field value (bytes constrained to 8 bits)."""
    acc = 0
    for b in bts:
        api.to_binary(b, 8)
        acc = api.add(api.mul(acc, 256), b)
    return acc


def bits_to_bytes(api, bits):
    """LSB-first bits -> big-endian bytes (pads to a byte boundary)."""
    n = len(bits)
    nbytes = -(-n // 8)
    padded = list(bits) + [0] * (8 * nbytes - n)
    return [api.from_binary(padded[8 * (nbytes - 1 - i): 8 * (nbytes - i)])
            for i in range(nbytes)]
