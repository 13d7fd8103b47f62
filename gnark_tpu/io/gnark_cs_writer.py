"""Writer for gnark's serialized constraint systems (.r1cs / .scs).

Exact inverse of io/gnark_cs.py's parser: emits the wrapper
(constraint/bn254/marshal.go WriteTo), the 4-block packed binary
(constraint/marshal.go ToBytes: levels / instructions / calldata /
CBOR body) and the Montgomery coeff table (constraint/bn254/coeff.go
toBytes). The CBOR encoder follows fxamacker/cbor CoreDetEncOptions
(RFC 8949 core deterministic: minimal-length heads, definite lengths,
map keys sorted bytewise on their encoding), which is what gnark uses
(constraint/marshal.go:134).

Byte-parity is pinned by tests/test_gnark_cs_reader.py: re-encoding
the parsed gnark fixtures reproduces them byte-for-byte, and systems
built by cs_to_gnark_bytes() load back through read_gnark_cs.

Two layers:

  write_gnark_raw(raw)    raw dict (as returned by parse_gnark_cs)
                          -> bytes; exact re-serialization.
  cs_to_gnark_bytes(cs)   our ConstraintSystem -> gnark bytes, the
                          interop EXPORT path (compile here, prove
                          with gnark, or synthesize >=128-value
                          fixtures for the intcomp full-block path).
"""

from __future__ import annotations

import struct

from gnark_tpu.constraint.system import ConstraintSystem
from gnark_tpu.io import intcomp
from gnark_tpu.io.gnark_cs import Tagged, _TAG0, _TAG_NAMES

KIND_TO_TAG = {n: _TAG0 + i for i, n in enumerate(_TAG_NAMES)}


# -- CBOR core-deterministic encoder ------------------------------------------

def _head(major: int, arg: int) -> bytes:
    if arg < 24:
        return bytes([(major << 5) | arg])
    if arg < 0x100:
        return bytes([(major << 5) | 24, arg])
    if arg < 0x10000:
        return struct.pack(">BH", (major << 5) | 25, arg)
    if arg < 0x100000000:
        return struct.pack(">BI", (major << 5) | 26, arg)
    return struct.pack(">BQ", (major << 5) | 27, arg)


def cbor_encode(obj) -> bytes:
    if obj is True:
        return b"\xf5"
    if obj is False:
        return b"\xf4"
    if obj is None:
        return b"\xf6"
    if isinstance(obj, int):
        if obj >= 0:
            return _head(0, obj)
        return _head(1, -1 - obj)
    if isinstance(obj, bytes):
        return _head(2, len(obj)) + obj
    if isinstance(obj, str):
        b = obj.encode("utf-8")
        return _head(3, len(b)) + b
    if isinstance(obj, (list, tuple)):
        return _head(4, len(obj)) + b"".join(cbor_encode(v) for v in obj)
    if isinstance(obj, dict):
        items = sorted((cbor_encode(k), cbor_encode(v))
                       for k, v in obj.items())
        return _head(5, len(obj)) + b"".join(k + v for k, v in items)
    if isinstance(obj, Tagged):
        return _head(6, obj.tag) + cbor_encode(obj.value)
    raise TypeError(f"cbor: cannot encode {type(obj).__name__}")


# -- 4-block binary + wrapper ---------------------------------------------------

def _uvarint(v: int) -> bytes:
    out = bytearray()
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)
    return bytes(out)


def write_gnark_raw(raw: dict) -> bytes:
    """Serialize a raw section dict (parse_gnark_cs layout) back into
    gnark's on-disk bytes."""
    field = raw["field"]

    levels_b = struct.pack("<Q", len(raw["levels"]))
    for lvl in raw["levels"]:
        levels_b += intcomp.write_stream_u32(lvl)

    instr_b = (intcomp.write_stream_u32(raw["blueprint_ids"])
               + intcomp.write_stream_u32(raw["constraint_offsets"])
               + intcomp.write_stream_u32(raw["wire_offsets"])
               + intcomp.write_stream_u64(raw["calldata_starts"]))

    call_b = struct.pack("<Q", len(raw["calldata"])) + b"".join(
        _uvarint(v) for v in raw["calldata"])

    body_b = cbor_encode(raw["body"])

    system = (struct.pack("<4Q", len(levels_b), len(instr_b),
                          len(call_b), len(body_b))
              + levels_b + instr_b + call_b + body_b)

    nb = 8 * ((field.bits + 63) // 64)
    coeff_b = struct.pack("<Q", len(raw["coeffs"]))
    for c in raw["coeffs"]:
        coeff_b += field.to_mont(c).to_bytes(nb, "little")

    maj, mi, pa = raw.get("version", (0, 14, 0))
    total = len(system) + len(coeff_b)
    return struct.pack("<4Q", total, maj, mi, pa) + system + coeff_b


# -- our IR -> gnark raw sections -----------------------------------------------

# reserved coeff-table slots (constraint/term.go:10-26)
def _coeff_table(field):
    q = field.modulus
    base = [0, 1, 2, q - 1, q - 2]
    index = {v: i for i, v in enumerate(base)}
    return base, index


def _fnv1a32(name: str) -> int:
    h = 0x811C9DC5
    for b in name.encode():
        h = ((h ^ b) * 0x01000193) & 0xFFFFFFFF
    return h


def cs_to_gnark_bytes(cs: ConstraintSystem,
                      version=(0, 14, 0)) -> bytes:
    """Export our ConstraintSystem as a gnark .r1cs/.scs blob.

    Inverse of read_gnark_cs's wire conventions: R1CS wire ids map
    1:1; SCS wire ids are shifted by -1 (gnark SCS has no constant
    wire; our wire 0 must not appear in any SCS constraint term with
    nonzero coeff except via qC).
    """
    field = cs.field
    coeffs, cindex = _coeff_table(field)

    def cid(v: int) -> int:
        v %= field.modulus
        if v not in cindex:
            cindex[v] = len(coeffs)
            coeffs.append(v)
        return cindex[v]

    shift = 0 if cs.kind == "r1cs" else 1

    def lin(e):
        out = []
        for c, w in e:
            out.append(cid(c))
            out.append(w - shift)
        return out

    blueprints: list[str] = []
    bp_index: dict[str, int] = {}

    def bid_of(kind: str) -> int:
        if kind not in bp_index:
            bp_index[kind] = len(blueprints)
            blueprints.append(kind)
        return bp_index[kind]

    hint_ids: dict[str, int] = {}
    calldata: list[int] = []
    bids, coffs, woffs, starts = [], [], [], []
    levels: list[list[int]] = [[] for _ in cs.levels]

    nb_inputs = len(cs.public_names) - 1 + len(cs.secret_names) + shift
    # WireOffset bookkeeping (constraint/core.go:382-407): hints
    # allocate their outputs before the instruction is recorded.
    nb_alloc = nb_inputs
    nb_cons = 0

    for iid, inst in enumerate(cs.instructions):
        cd: list[int] = []
        if inst.kind == "hint":
            name = inst.hint_name
            hid = hint_ids.setdefault(name, _fnv1a32(name))
            bid = bid_of("hint")
            cd = [0, hid, len(inst.inputs)]
            for e in inst.inputs:
                t = lin(e)
                cd.append(len(t) // 2)
                cd += t
            out_lo = min(inst.outputs) - shift
            out_hi = max(inst.outputs) - shift + 1
            assert tuple(range(out_lo + shift, out_hi + shift)) == \
                tuple(inst.outputs), "hint outputs must be contiguous"
            cd += [out_lo, out_hi]
            cd[0] = len(cd)
            nb_alloc = max(nb_alloc, out_hi)
            n_cons = 0
        elif inst.kind in ("r1c", "assert"):
            c = cs.r1cs[inst.cidx]
            body = lin(c.l) + lin(c.r) + lin(c.o)
            cd = [4 + len(body), len(c.l), len(c.r), len(c.o)] + body
            bid = bid_of("r1c")
            n_cons = 1
        elif inst.kind == "scs":
            c = cs.sparse[inst.cidx]
            bid = bid_of("scs_generic_u64")
            cd = [c.xa - shift, c.xb - shift, c.xo - shift,
                  cid(c.qL), cid(c.qR), cid(c.qO), cid(c.qM),
                  cid(c.qC), c.commitment]
            n_cons = 1
        else:
            raise NotImplementedError(
                f"gnark export: instruction kind {inst.kind!r}")
        bids.append(bid)
        coffs.append(nb_cons)
        woffs.append(nb_alloc)
        starts.append(len(calldata))
        calldata += cd
        nb_cons += n_cons
        lvl = inst.level if inst.level < len(levels) else len(levels) - 1
        levels[lvl].append(iid)

    body = {
        "GnarkVersion": f"{version[0]}.{version[1]}.{version[2]}",
        "ScalarField": format(field.modulus, "x"),
        "Type": 1 if cs.kind == "r1cs" else 2,
        "Blueprints": [Tagged(KIND_TO_TAG[k], {}) for k in blueprints],
        "NbConstraints": nb_cons,
        "NbInternalVariables": cs.nb_internal,
        "Public": (cs.public_names if cs.kind == "r1cs"
                   else cs.public_names[1:]) or None,
        "Secret": list(cs.secret_names) or None,
        "Logs": None,
        "DebugInfo": None,
        "GkrInfo": None,
        "SymbolTable": {"Functions": None, "Locations": None},
        "MDebug": {},
        "MHintsDependencies": {v: k for k, v in hint_ids.items()},
        "CommitmentInfo": _commitments_cbor(cs, shift),
    }

    raw = {
        "field": field,
        "version": version,
        "levels": [lv for lv in levels if lv] or levels[:1],
        "blueprint_ids": bids,
        "constraint_offsets": coffs,
        "wire_offsets": woffs,
        "calldata_starts": starts,
        "calldata": calldata,
        "body": body,
        "coeffs": coeffs,
    }
    return write_gnark_raw(raw)


def _commitments_cbor(cs: ConstraintSystem, shift: int):
    if cs.kind == "r1cs":
        tag = KIND_TO_TAG["groth16_commitments"]
        val = [{
            "CommitmentIndex": cm.commitment_wire - shift,
            "PrivateCommitted": [
                w - shift for w in
                cm.committed_wires[cm.nb_public_committed:]],
            "PublicAndCommitmentCommitted": [
                w - shift for w in
                cm.committed_wires[:cm.nb_public_committed]] or None,
            "NbPublicCommitted": sum(
                1 for w in cm.committed_wires[:cm.nb_public_committed]
                if w < cs.nb_public),
            "HintID": _fnv1a32(cm.hint_name or "bsb22"),
        } for cm in cs.commitments]
    else:
        tag = KIND_TO_TAG["plonk_commitments"]
        val = [{
            "CommitmentIndex": cm.commitment_row,
            "Committed": list(cm.committed_rows),
            "HintID": _fnv1a32(cm.hint_name or "bsb22"),
        } for cm in cs.commitments]
    return Tagged(tag, val)


def dump_gnark_cs(cs: ConstraintSystem, path: str,
                  version=(0, 14, 0)) -> None:
    with open(path, "wb") as f:
        f.write(cs_to_gnark_bytes(cs, version))
