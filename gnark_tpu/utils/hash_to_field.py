"""RFC 9380 hash-to-field (gnark-crypto fr/hash_to_field analog).

expand_message_xmd over SHA-256 + reduction of L = ceil((log2(p)+128)/8)
bytes per element — the construction the reference uses ~20x for
commitment challenges and BSB22 hash-to-field."""

from __future__ import annotations

import hashlib


def expand_message_xmd(msg: bytes, dst: bytes, len_in_bytes: int) -> bytes:
    H = hashlib.sha256
    b_in_bytes = 32
    r_in_bytes = 64
    ell = -(-len_in_bytes // b_in_bytes)
    if ell > 255 or len(dst) > 255:
        raise ValueError("expand_message_xmd bounds")
    dst_prime = dst + bytes([len(dst)])
    z_pad = b"\x00" * r_in_bytes
    l_i_b_str = len_in_bytes.to_bytes(2, "big")
    b0 = H(z_pad + msg + l_i_b_str + b"\x00" + dst_prime).digest()
    b1 = H(b0 + b"\x01" + dst_prime).digest()
    out = b1
    prev = b1
    for i in range(2, ell + 1):
        prev = H(bytes(x ^ y for x, y in zip(b0, prev))
                 + bytes([i]) + dst_prime).digest()
        out += prev
    return out[:len_in_bytes]


def hash_to_field(msg: bytes, dst: bytes, count: int, p: int) -> list:
    L = -(-(p.bit_length() + 128) // 8)
    u = expand_message_xmd(msg, dst, count * L)
    return [int.from_bytes(u[i * L:(i + 1) * L], "big") % p
            for i in range(count)]
