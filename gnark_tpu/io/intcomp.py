"""Integer compression codec for gnark's constraint-system streams.

gnark serializes its levels/instruction columns through
`github.com/ronanh/intcomp` (wrapped by the reference's
internal/backend/ioutils/intcomp.go:12-32): delta encoding + per-block
bit packing for full blocks, varint encoding for the tail.

Provenance of the layout implemented here, in decreasing certainty:

* The stream/word envelope and the TAIL (varint) block were derived
  byte-for-byte from gnark-generated fixtures
  (tests/data/gnark_fixtures/issue1045.{r1cs,scs}): every block is

      u32 streams:  [count][N][payload words ...][N]
      u64 streams:  [count | N<<32][payload words ...][N]

  where `count` is the number of values in the block and `N` =
  (block length in words) - 1, repeated as the block's final word so
  the stream can also be walked backwards (append/recompress support
  in the upstream library). Tail blocks (count < block size) carry
  deltas — cumulative mod 2^W from the previous block's last value,
  starting at 0 — as big-endian MSB-continuation varints, packed
  big-endian into words and 0x80-padded to a word boundary.

* The FULL-BLOCK (bit-packed) layout has no fixture in either repo
  and the upstream Go source is not available in this environment;
  the layout below is a documented reconstruction of the library's
  advertised algorithm (delta + binary packing a la FastPFOR
  integrated bit packing, block sizes 128/256): the payload starts
  with one descriptor word `bitlen | ntz<<8` followed by
  ceil(count*bitlen/W) words holding the (delta >> ntz) values packed
  LSB-first. Encoder and decoder are exact inverses (round-trip
  property tested on the reference's intcomp fuzz corpus inputs), so
  systems written by this module always load back; byte-parity with
  upstream for >=128-value streams is validated as far as the
  available fixtures allow.

Reference: internal/backend/ioutils/intcomp.go, constraint/marshal.go
(which length-prefixes each compressed stream with a u64 word count).
"""

from __future__ import annotations

import struct

BLOCK32 = 128
BLOCK64 = 256

__all__ = [
    "compress_u32", "decompress_u32", "compress_u64", "decompress_u64",
    "read_stream_u32", "read_stream_u64",
    "write_stream_u32", "write_stream_u64",
]


# -- varint (tail) blocks ----------------------------------------------------
#
# Big-endian byte order inside each word; each delta is an MSB-first
# base-128 varint whose non-final bytes set 0x80; padding bytes are
# 0x80 (a bare continuation can never terminate a value, so a decoder
# scanning for `count` values never consumes padding as data).

def _varint_bytes(v: int) -> bytes:
    groups = []
    while True:
        groups.append(v & 0x7F)
        v >>= 7
        if not v:
            break
    groups.reverse()
    out = bytearray(0x80 | g for g in groups[:-1])
    out.append(groups[-1])
    return bytes(out)


def _encode_tail(values, prev: int, word_bytes: int, mask: int):
    payload = bytearray()
    for v in values:
        payload += _varint_bytes((v - prev) & mask)
        prev = v
    while len(payload) % word_bytes:
        payload.append(0x80)
    fmt = ">I" if word_bytes == 4 else ">Q"
    return [struct.unpack(fmt, payload[i:i + word_bytes])[0]
            for i in range(0, len(payload), word_bytes)]


def _decode_tail(words, count: int, prev: int, word_bytes: int, mask: int):
    fmt = ">I" if word_bytes == 4 else ">Q"
    payload = b"".join(struct.pack(fmt, w) for w in words)
    vals, v, i = [], 0, 0
    while len(vals) < count:
        if i >= len(payload):
            raise ValueError("intcomp: varint payload exhausted")
        b = payload[i]
        i += 1
        v = (v << 7) | (b & 0x7F)
        if not b & 0x80:
            prev = (prev + v) & mask
            vals.append(prev)
            v = 0
    return vals


# -- bit-packed (full) blocks -------------------------------------------------

def _encode_full(values, prev: int, wbits: int, mask: int):
    """Pack one full block: descriptor word `bitlen | ntz<<8`, then
    the (delta >> ntz) values at bitlen bits each, LSB-first."""
    deltas = []
    for v in values:
        deltas.append((v - prev) & mask)
        prev = v
    ntz = wbits
    for d in deltas:
        if d:
            t = (d & -d).bit_length() - 1
            if t < ntz:
                ntz = t
        if ntz == 0:
            break
    if ntz == wbits:          # all deltas zero
        return [0]            # bitlen 0, ntz 0 -> no payload words
    shifted = [d >> ntz for d in deltas]
    bitlen = max(s.bit_length() for s in shifted)
    words = [bitlen | (ntz << 8)]
    acc, nbits = 0, 0
    for s in shifted:
        acc |= s << nbits
        nbits += bitlen
        while nbits >= wbits:
            words.append(acc & mask)
            acc >>= wbits
            nbits -= wbits
    if nbits:
        words.append(acc & mask)
    return words


def _decode_full(words, count: int, prev: int, wbits: int, mask: int):
    desc = words[0]
    bitlen = desc & 0xFF
    ntz = (desc >> 8) & 0xFF
    if bitlen == 0:
        return [prev] * count
    vals = []
    acc, nbits, j = 0, 0, 1
    vmask = (1 << bitlen) - 1
    for _ in range(count):
        while nbits < bitlen:
            acc |= words[j] << nbits
            j += 1
            nbits += wbits
        prev = (prev + ((acc & vmask) << ntz)) & mask
        vals.append(prev)
        acc >>= bitlen
        nbits -= bitlen
    return vals


def _full_nwords(bitlen: int, count: int, wbits: int) -> int:
    if bitlen == 0:
        return 1
    return 1 + (count * bitlen + wbits - 1) // wbits


# -- streams -------------------------------------------------------------------

def compress_u32(values) -> list[int]:
    """[]u32 -> compressed u32 words (intcomp.CompressUint32)."""
    return _compress(values, BLOCK32, 32, 0xFFFFFFFF)


def compress_u64(values) -> list[int]:
    return _compress(values, BLOCK64, 64, (1 << 64) - 1)


def _compress(values, block: int, wbits: int, mask: int) -> list[int]:
    out = []
    prev = 0
    i = 0
    n = len(values)
    while i + block <= n:
        payload = _encode_full(values[i:i + block], prev, wbits, mask)
        out += _emit_block(block, payload, wbits)
        prev = values[i + block - 1]
        i += block
    if i < n:
        payload = _encode_tail(values[i:], prev, wbits // 8, mask)
        out += _emit_block(n - i, payload, wbits)
    return out


def _emit_block(count: int, payload, wbits: int) -> list[int]:
    if wbits == 32:
        nwords = len(payload) + 3          # count, N, payload, trailer
        N = nwords - 1
        return [count, N] + payload + [N]
    nwords = len(payload) + 2              # count|N<<32, payload, trailer
    N = nwords - 1
    return [count | (N << 32)] + payload + [N]


def decompress_u32(words) -> list[int]:
    return _decompress(words, BLOCK32, 32, 0xFFFFFFFF)


def decompress_u64(words) -> list[int]:
    return _decompress(words, BLOCK64, 64, (1 << 64) - 1)


def _decompress(words, block: int, wbits: int, mask: int) -> list[int]:
    vals = []
    prev = 0
    i = 0
    while i < len(words):
        if wbits == 32:
            count = words[i]
            N = words[i + 1]
            payload = words[i + 2:i + N]
            nxt = i + N + 1
        else:
            count = words[i] & 0xFFFFFFFF
            N = words[i] >> 32
            payload = words[i + 1:i + N]
            nxt = i + N + 1
        if count > block:
            raise ValueError(f"intcomp: block count {count} > {block}")
        if count == block:
            vals += _decode_full(payload, count, prev, wbits, mask)
        else:
            vals += _decode_tail(payload, count, prev, wbits // 8, mask)
        prev = vals[-1] if vals else 0
        i = nxt
    return vals


# -- length-prefixed wrappers (ioutils.CompressAndWriteUints32/64) -------------

def write_stream_u32(values) -> bytes:
    words = compress_u32(values)
    return struct.pack("<Q", len(words)) + struct.pack(
        f"<{len(words)}I", *words)


def write_stream_u64(values) -> bytes:
    words = compress_u64(values)
    return struct.pack("<Q", len(words)) + struct.pack(
        f"<{len(words)}Q", *words)


def read_stream_u32(buf: bytes, off: int):
    (ln,) = struct.unpack_from("<Q", buf, off)
    words = struct.unpack_from(f"<{ln}I", buf, off + 8)
    return decompress_u32(words), off + 8 + 4 * ln


def read_stream_u64(buf: bytes, off: int):
    (ln,) = struct.unpack_from("<Q", buf, off)
    words = struct.unpack_from(f"<{ln}Q", buf, off + 8)
    return decompress_u64(words), off + 8 + 8 * ln
