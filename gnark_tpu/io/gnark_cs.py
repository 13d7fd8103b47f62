"""Reader for gnark's serialized constraint systems (.r1cs / .scs).

Format (reference constraint/marshal.go:17-110 + per-curve wrapper
constraint/bn254/marshal.go WriteTo):

  [totalLen u64][gnark major u64][minor u64][patch u64]     wrapper
  [levelsLen u64][instrLen u64][calldataLen u64][bodyLen u64]  header
  levels:       u64 count, then per level one intcomp stream
  instructions: 3 intcomp-u32 streams (blueprintID, constraintOffset,
                wireOffset) + 1 intcomp-u64 stream (startCallData)
  calldata:     u64 count + uvarint-encoded words
  body:         CBOR (fxamacker/cbor core-deterministic, tag registry
                constraint/marshal.go:364-422 starting at 5309735)
  coeff table:  u64 count + count fr elements as little-endian u64
                limb words in MONTGOMERY form (constraint/bn254/
                coeff.go toBytes)

intcomp (github.com/ronanh/intcomp, wrapped by
internal/backend/ioutils/intcomp.go): the library bit-packs full
blocks of 128 (u32) / 256 (u64) deltas and encodes the remainder as a
varint block. The varint-block layout implemented here was validated
byte-for-byte against the two gnark-generated fixtures checked into
the reference (internal/regression_tests/issue1045/testdata/): one
32-bit word holds the value count, one word a block descriptor, then
deltas as BIG-ENDIAN-byte MSB-continuation varints packed into words,
0x80-padded. Streams holding >=128 values use the bit-packed block
whose layout has no public spec or fixture; those raise
NotImplementedError rather than guess.

The decoded system is mapped onto gnark_tpu's own IR
(constraint/system.py) so gnark-compiled circuits solve and prove
here: R1CS wire numbering matches ours exactly (wire 0 = constant
one); SCS wires are shifted by +1 because our SCS keeps the constant
wire at 0 while gnark's does not.
"""

from __future__ import annotations

import io as _io
import struct

from gnark_tpu import fields
from gnark_tpu.constraint.system import (
    ConstraintSystem, Instruction, R1C, SparseR1C)

# -- CBOR tag registry (constraint/marshal.go:364-422) ----------------------

_TAG0 = 5309735
_TAG_NAMES = [
    "hint", "r1c", "groth16_commitments", "plonk_commitments",
    "scs_generic_u32", "scs_add_u32", "scs_mul_u32", "scs_bool_u32",
    "lookup_u32",
    "scs_generic_u64", "scs_add_u64", "scs_mul_u64", "scs_bool_u64",
    "lookup_u64",
    "batch_inverse_u32", "batch_inverse_u64",
    "gkr_skip", "gkr_sumcheck", "gkr_zerocheck",
]
TAG_TO_KIND = {_TAG0 + i: n for i, n in enumerate(_TAG_NAMES)}

# scalar-field modulus (decimal string in the body) -> our FieldParams
_FIELDS_BY_MODULUS = {f.modulus: f for f in fields.FIELDS.values()}


class GnarkCSError(ValueError):
    pass


# -- minimal CBOR decoder ----------------------------------------------------

class Tagged:
    __slots__ = ("tag", "value")

    def __init__(self, tag, value):
        self.tag, self.value = tag, value

    def __repr__(self):
        return f"Tagged({self.tag}, {self.value!r})"


def _cbor_decode(data: bytes):
    """Decode one CBOR item (definite lengths; fxamacker core-det
    encoding uses no indefinite forms)."""
    obj, n = _cbor_item(data, 0)
    return obj


def _cbor_head(data, i):
    ib = data[i]
    major, info = ib >> 5, ib & 0x1F
    i += 1
    if info < 24:
        return major, info, i
    if info == 24:
        return major, data[i], i + 1
    if info == 25:
        return major, struct.unpack_from(">H", data, i)[0], i + 2
    if info == 26:
        return major, struct.unpack_from(">I", data, i)[0], i + 4
    if info == 27:
        return major, struct.unpack_from(">Q", data, i)[0], i + 8
    raise GnarkCSError(f"cbor: indefinite/reserved length info {info}")


def _cbor_item(data, i):
    major, arg, i = _cbor_head(data, i)
    if major == 0:
        return arg, i
    if major == 1:
        return -1 - arg, i
    if major == 2:
        return data[i:i + arg], i + arg
    if major == 3:
        return data[i:i + arg].decode("utf-8"), i + arg
    if major == 4:
        out = []
        for _ in range(arg):
            v, i = _cbor_item(data, i)
            out.append(v)
        return out, i
    if major == 5:
        out = {}
        for _ in range(arg):
            k, i = _cbor_item(data, i)
            v, i = _cbor_item(data, i)
            out[k] = v
        return out, i
    if major == 6:
        v, i = _cbor_item(data, i)
        return Tagged(arg, v), i
    # major 7: simple values / floats
    if arg == 20:
        return False, i
    if arg == 21:
        return True, i
    if arg in (22, 23):
        return None, i
    raise GnarkCSError(f"cbor: unsupported simple/float value {arg}")


# -- intcomp varint-block decoder --------------------------------------------

def _varint_deltas(payload: bytes, count: int, bits: int):
    """Decode `count` values from BIG-ENDIAN-byte MSB-continuation
    varint deltas (cumulative from 0), 0x80-padded."""
    vals, v, i = [], 0, 0
    acc = 0
    mask = (1 << bits) - 1
    while len(vals) < count:
        if i >= len(payload):
            raise GnarkCSError("intcomp: varint payload exhausted")
        b = payload[i]
        i += 1
        v = (v << 7) | (b & 0x7F)
        if not b & 0x80:
            acc = (acc + v) & mask
            vals.append(acc)
            v = 0
    return vals


def _decode_intcomp_u32(words):
    """words: sequence of uint32. Returns list[int]."""
    if len(words) == 0:
        return []
    count = words[0]
    if count >= 128 or len(words) < 2:
        raise NotImplementedError(
            "intcomp bit-packed 128-blocks not supported (no public "
            f"spec/fixture); stream advertises {count} values")
    payload = b"".join(struct.pack(">I", w) for w in words[2:])
    return _varint_deltas(payload, count, 32)


def _decode_intcomp_u64(words):
    if len(words) == 0:
        return []
    count = words[0] & 0xFFFFFFFF
    if count >= 256:
        raise NotImplementedError(
            "intcomp bit-packed 256-blocks not supported (no public "
            f"spec/fixture); stream advertises {count} values")
    payload = b"".join(struct.pack(">Q", w) for w in words[1:])
    return _varint_deltas(payload, count, 64)


def _read_u32_stream(buf, off):
    (ln,) = struct.unpack_from("<Q", buf, off)
    words = struct.unpack_from(f"<{ln}I", buf, off + 8)
    return _decode_intcomp_u32(words), off + 8 + 4 * ln


def _read_u64_stream(buf, off):
    (ln,) = struct.unpack_from("<Q", buf, off)
    words = struct.unpack_from(f"<{ln}Q", buf, off + 8)
    return _decode_intcomp_u64(words), off + 8 + 8 * ln


def _read_uvarints(buf, off, n):
    out = []
    for _ in range(n):
        v, s = 0, 0
        while True:
            b = buf[off]
            off += 1
            v |= (b & 0x7F) << s
            s += 7
            if not b & 0x80:
                break
        out.append(v)
    return out, off


# -- top-level parse ----------------------------------------------------------

def parse_gnark_cs(data: bytes) -> dict:
    """Parse a gnark .r1cs/.scs byte blob into a raw dict (sections
    decoded, nothing interpreted). See read_gnark_cs for the mapped
    ConstraintSystem."""
    total, _maj, _mi, _pa = struct.unpack_from("<4Q", data, 0)
    if 32 + total != len(data):
        raise GnarkCSError(
            f"length mismatch: wrapper says {32 + total}, got {len(data)}")
    off = 32
    lv, ins, cd, body = struct.unpack_from("<4Q", data, off)
    p = off + 32
    levels_b = data[p:p + lv]; p += lv
    instr_b = data[p:p + ins]; p += ins
    call_b = data[p:p + cd]; p += cd
    body_b = data[p:p + body]; p += body
    coeff_b = data[p:]

    # levels
    (nlev,) = struct.unpack_from("<Q", levels_b, 0)
    q = 8
    levels = []
    for _ in range(nlev):
        lvl, q = _read_u32_stream(levels_b, q)
        levels.append(lvl)

    # instructions
    q = 0
    bids, q = _read_u32_stream(instr_b, q)
    coffs, q = _read_u32_stream(instr_b, q)
    woffs, q = _read_u32_stream(instr_b, q)
    starts, q = _read_u64_stream(instr_b, q)

    # calldata
    (ncd,) = struct.unpack_from("<Q", call_b, 0)
    calldata, _ = _read_uvarints(call_b, 8, ncd)

    sysmap = _cbor_decode(body_b)

    # coeff table: u64 count + count elements of ceil(bits/64) LE u64
    # limbs each, MONTGOMERY form
    (nco,) = struct.unpack_from("<Q", coeff_b, 0)
    modulus = int(sysmap["ScalarField"], 16)  # q.Text(16)
    field = _FIELDS_BY_MODULUS.get(modulus)
    if field is None:
        raise GnarkCSError(f"unknown scalar field modulus {modulus}")
    nb = 8 * ((field.bits + 63) // 64)
    coeffs = []
    for i in range(nco):
        raw = coeff_b[8 + i * nb: 8 + (i + 1) * nb]
        coeffs.append(field.from_mont(int.from_bytes(raw, "little")))

    return {
        "field": field,
        "levels": levels,
        "blueprint_ids": bids,
        "constraint_offsets": coffs,
        "wire_offsets": woffs,
        "calldata_starts": starts,
        "calldata": calldata,
        "body": sysmap,
        "coeffs": coeffs,
    }


def _linexp(calldata, j, n, coeffs, shift):
    terms = []
    for _ in range(n):
        cid, vid = calldata[j], calldata[j + 1]
        terms.append((coeffs[cid], vid + shift))
        j += 2
    return tuple(terms), j


def read_gnark_cs(data: bytes) -> ConstraintSystem:
    """Deserialize a gnark constraint system into our IR.

    The result solves/proves with our backends (hints must be
    registered under their gnark qualified names, or passed via
    hint_overrides). Raises NotImplementedError on features with no
    counterpart yet (GKR levels, lookup blueprints, commitments)."""
    raw = parse_gnark_cs(data)
    body = raw["body"]
    coeffs = raw["coeffs"]
    calldata = raw["calldata"]

    sys_type = body["Type"]          # 1 = R1CS, 2 = SparseR1CS
    if sys_type not in (1, 2):
        raise GnarkCSError(f"unknown SystemType {sys_type}")
    kind = "r1cs" if sys_type == 1 else "scs"

    # blueprint id -> kind name
    bkinds = []
    for bp in body["Blueprints"]:
        if not isinstance(bp, Tagged) or bp.tag not in TAG_TO_KIND:
            raise GnarkCSError(f"unknown blueprint encoding {bp!r}")
        bkinds.append(TAG_TO_KIND[bp.tag])

    hints = {int(k): v for k, v in (body.get("MHintsDependencies")
                                    or {}).items()}

    ci = body.get("CommitmentInfo")
    if isinstance(ci, Tagged) and ci.value:
        raise NotImplementedError(
            "gnark CS with in-circuit commitments not mapped yet")

    cs = ConstraintSystem(raw["field"], kind)
    # gnark R1CS: Public[] includes the constant-one wire; ours too.
    # gnark SCS: no constant wire -> shift every gnark wire id by +1.
    pub = list(body.get("Public") or [])
    sec = list(body.get("Secret") or [])
    shift = 0
    if kind == "r1cs":
        cs.public_names = pub if pub and pub[0] == "1" else ["1"] + pub
    else:
        cs.public_names = ["1"] + pub
        shift = 1
    cs.secret_names = sec
    cs.nb_internal = body["NbInternalVariables"]

    level_of = {}
    for lvl, insts in enumerate(raw["levels"]):
        for iid in insts:
            level_of[iid] = lvl

    n_inst = len(raw["blueprint_ids"])
    for iid in range(n_inst):
        bid = raw["blueprint_ids"][iid]
        start = raw["calldata_starts"][iid]
        bkind = bkinds[bid]
        lvl = level_of.get(iid, 0)
        if bkind == "hint":
            j = start
            hint_id = calldata[j + 1]
            n_in = calldata[j + 2]
            j += 3
            ins = []
            for _ in range(n_in):
                e, j = _linexp(calldata, j + 1, calldata[j], coeffs, shift)
                ins.append(e)
            out_s, out_e = calldata[j], calldata[j + 1]
            name = hints.get(hint_id, f"gnark_hint_{hint_id}")
            inst = Instruction(
                kind="hint", hint_name=name, inputs=tuple(ins),
                outputs=tuple(range(out_s + shift, out_e + shift)),
                level=lvl)
        elif bkind == "r1c":
            j = start
            lenL, lenR, lenO = calldata[j + 1], calldata[j + 2], \
                calldata[j + 3]
            j += 4
            L, j = _linexp(calldata, j, lenL, coeffs, shift)
            R, j = _linexp(calldata, j, lenR, coeffs, shift)
            O, j = _linexp(calldata, j, lenO, coeffs, shift)
            cs.r1cs.append(R1C(L, R, O))
            inst = Instruction(kind="r1c", cidx=len(cs.r1cs) - 1,
                               level=lvl)
        elif bkind.startswith("scs_"):
            cd = calldata[start:]
            q = cs.q
            if bkind.startswith("scs_generic"):
                xa, xb, xc = cd[0], cd[1], cd[2]
                con = SparseR1C(
                    xa + shift, xb + shift, xc + shift,
                    coeffs[cd[3]], coeffs[cd[4]], coeffs[cd[5]],
                    coeffs[cd[6]], coeffs[cd[7]], commitment=cd[8])
            elif bkind.startswith("scs_add"):
                # qL*xa + qR*xb + qC == xc  (QO = -1)
                con = SparseR1C(
                    cd[0] + shift, cd[1] + shift, cd[2] + shift,
                    coeffs[cd[3]], coeffs[cd[4]], q - 1, 0,
                    coeffs[cd[5]])
            elif bkind.startswith("scs_mul"):
                # qM*xa*xb == xc  (QO = -1)
                con = SparseR1C(
                    cd[0] + shift, cd[1] + shift, cd[2] + shift,
                    0, 0, q - 1, coeffs[cd[3]], 0)
            elif bkind.startswith("scs_bool"):
                # qL*xa + qM*xa*xa == 0
                con = SparseR1C(
                    cd[0] + shift, cd[0] + shift, shift,
                    coeffs[cd[1]], 0, 0, coeffs[cd[2]], 0)
            else:
                raise NotImplementedError(
                    f"blueprint {bkind} not mapped yet")
            cs.sparse.append(con)
            inst = Instruction(kind="scs", cidx=len(cs.sparse) - 1,
                               level=lvl)
        else:
            raise NotImplementedError(f"blueprint {bkind} not mapped yet")
        cs.instructions.append(inst)
        while len(cs.levels) <= lvl:
            cs.levels.append([])
        cs.levels[lvl].append(iid)

    want = body["NbConstraints"]
    if cs.nb_constraints != want:
        raise GnarkCSError(
            f"constraint count mismatch: decoded {cs.nb_constraints}, "
            f"body says {want}")
    return cs


def load_gnark_cs(path: str) -> ConstraintSystem:
    with open(path, "rb") as f:
        return read_gnark_cs(f.read())
