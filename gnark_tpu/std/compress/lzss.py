"""LZSS compression with an in-circuit decompressor
(reference std/compress/lzss/snark.go — rollup blob verification).

Format (byte-aligned; the reference uses consensys/compress's
bit-packed stream — this is OUR wire format, with the same circuit
decompression structure: marker symbol, copy-length state machine,
log-derivative random access into the output history):

    literal byte b (b != 0): emitted as itself
    backref: [0x00, offL, offH, len1]
        offset = offL + 256*offH + 1   (1 .. 2^16)
        length = len1 + 1              (1 .. 256)
        copies `length` bytes starting at output position
        outI - offset; addresses before the start of the output read
        as 0x00 (a one-byte zero "dictionary", so zero bytes and
        leading zero-runs are always encodable).

The circuit decompressor walks one OUTPUT byte per step (static output
bound), with the reference's state machine: copyLen counts down inside
a backref; the input cursor advances by the token size exactly on the
step that finishes its token; bytes past EOF are forced to zero.
Backref addresses are arithmetically bounded below the current output
position, so the append-only log-derivative table cannot be read
"into the future"."""

from __future__ import annotations

DICT = 1                 # one implicit zero byte before the output
MAX_OFFSET = 1 << 16
MAX_LEN = 256
MIN_MATCH = 4            # a backref costs 4 bytes


# -- host codec --------------------------------------------------------------

def compress(data: bytes) -> bytes:
    """Greedy longest-match LZSS with the zero-dictionary trick.

    Overlapping copies are legal (the source reads the output stream
    being produced, which equals `data` for an honest stream), so a
    match at offset `off` extends while
    data[i+k] == data[i+k-off] (or 0 when i+k-off < 0)."""
    out = bytearray()
    i = 0
    n = len(data)

    def src(j: int) -> int:
        return data[j] if j >= 0 else 0

    while i < n:
        best_len = 0
        best_off = 0
        for off in range(1, min(i + DICT, MAX_OFFSET) + 1):
            ln = 0
            while (i + ln < n and ln < MAX_LEN
                   and data[i + ln] == src(i + ln - off)):
                ln += 1
            if ln > best_len:
                best_len = ln
                best_off = off
                if ln >= MAX_LEN:
                    break
        if best_len >= MIN_MATCH or (data[i] == 0 and best_len >= 1):
            out += bytes([0, (best_off - 1) & 0xFF, (best_off - 1) >> 8,
                          best_len - 1])
            i += best_len
        else:
            out.append(data[i])
            i += 1
    return bytes(out)


def decompress(comp: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(comp):
        b = comp[i]
        if b != 0:
            out.append(b)
            i += 1
            continue
        off = comp[i + 1] + 256 * comp[i + 2] + 1
        ln = comp[i + 3] + 1
        for k in range(ln):
            j = len(out) - off
            out.append(out[j] if j >= 0 else 0)
        i += 4
    return bytes(out)


# -- in-circuit decompressor -------------------------------------------------

def decompress_circuit(api, c, c_length, d_max: int):
    """Decompress the compressed byte variables `c` (padded to a static
    length; `c_length` = actual length) into at most `d_max` output
    byte variables.

    Returns (d, d_length): output byte list (zero past EOF) and the
    decompressed length. The circuit is UNSATISFIABLE for malformed
    streams (out-of-range backrefs, non-byte inputs)."""
    from gnark_tpu.std.lookup import Table
    from gnark_tpu.std import rangecheck

    rc = rangecheck.checker(api)
    for b in c:
        rc.check(b, 8)
    api.assert_is_less_or_equal(c_length, len(c))

    bytes_t = Table(api)
    for b in c:
        bytes_t.insert(b)
    for _ in range(4):
        bytes_t.insert(0)          # cursor overread padding

    out_t = Table(api)
    for _ in range(DICT):
        out_t.insert(0)

    in_i = 0
    copy_len = 0
    copy_len01 = 1
    eof = api.is_zero(c_length)
    d = []
    d_length = 0

    for out_i in range(d_max):
        curr = bytes_t.lookup(in_i)[0]
        is_br = api.is_zero(curr)

        off_l = bytes_t.lookup(api.add(in_i, 1))[0]
        off_h = bytes_t.lookup(api.add(in_i, 2))[0]
        len1 = bytes_t.lookup(api.add(in_i, 3))[0]
        indicated_len = api.mul(api.add(len1, 1), is_br)

        copy_len = api.select(copy_len01, indicated_len,
                              api.sub(copy_len, 1))
        # copy_len in {0, 1}?
        copy_len01 = api.is_zero(
            api.sub(api.mul(copy_len, copy_len), copy_len))
        # copying = copy_len01 ? copy_len : 1
        copying = api.add(api.mul(copy_len01, copy_len),
                          api.sub(1, copy_len01))

        offset = api.add(off_l, api.mul(256, off_h), 1)
        # addr = outI + DICT - offset, gated to 0 when not a backref;
        # the table lookup rejects addr outside [0, outI + DICT)
        addr = api.mul(api.sub(out_i + DICT, offset), is_br)
        to_copy = out_t.lookup(addr)[0]

        out_val = api.select(copying, to_copy, curr)
        out_val = api.mul(out_val, api.sub(1, eof))
        d.append(out_val)
        out_t.insert(out_val)
        d_length = api.add(d_length, api.sub(1, eof))

        # cursor advances by the token size on the finishing step
        delta = api.mul(copy_len01, api.add(1, api.mul(3, is_br)))
        in_i = api.add(in_i, api.mul(delta, api.sub(1, eof)))
        eof = api.or_(eof, api.is_zero(api.sub(in_i, c_length)))

    return d, d_length
