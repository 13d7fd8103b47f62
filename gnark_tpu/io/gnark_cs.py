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

intcomp streams (github.com/ronanh/intcomp, wrapped by
internal/backend/ioutils/intcomp.go) are decoded by io/intcomp.py:
tail (varint) blocks validated byte-for-byte against the gnark
fixtures, full bit-packed 128/256 blocks per the documented
reconstruction there (encoder/decoder are exact inverses, so systems
written by io/gnark_cs_writer.py always load back).

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
from gnark_tpu.constraint.hints import register_hint
from gnark_tpu.constraint.system import (
    Commitment, ConstraintSystem, Instruction, R1C, SparseR1C)
from gnark_tpu.io import intcomp

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


# -- intcomp streams (io/intcomp.py codec) ------------------------------------

_read_u32_stream = intcomp.read_stream_u32
_read_u64_stream = intcomp.read_stream_u64


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
    version = (_maj, _mi, _pa)
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
        "version": version,
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

    # lookup blueprints carry their table entries in the blueprint body
    # (BlueprintLookupHint.EntriesCalldata,
    # constraint/blueprint_logderivlookup.go:13-25)
    bp_entries = {}
    for bid, bp in enumerate(body["Blueprints"]):
        if bkinds[bid].startswith("lookup"):
            ec = (bp.value or {}).get("EntriesCalldata") or []
            entries, j = [], 0
            while j < len(ec):
                n = ec[j]
                j += 1
                entries.append(tuple((ec[j + 2 * t], ec[j + 2 * t + 1])
                                     for t in range(n)))
                j += 2 * n
            bp_entries[bid] = entries

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
        elif bkind.startswith("lookup"):
            # BlueprintLookupHint (blueprint_logderivlookup.go:31-74):
            # calldata = [size, nbEntries, nbInputs, inputs...]; table
            # entries come from the blueprint; outputs are
            # wireOffset + 0..nbInputs-1. Mapped onto the registered
            # gnark_lookup hint with inputs
            # (const nbEntries, entries[:nbEntries], queries).
            j = start
            n_entries, n_in = calldata[j + 1], calldata[j + 2]
            j += 3
            qs = []
            for _ in range(n_in):
                e, j = _linexp(calldata, j + 1, calldata[j], coeffs, shift)
                qs.append(e)
            ents = [tuple((coeffs[c], v + shift) for c, v in ent)
                    for ent in bp_entries[bid][:n_entries]]
            woff = raw["wire_offsets"][iid] + shift
            inst = Instruction(
                kind="hint", hint_name="gnark_lookup",
                inputs=tuple([((n_entries, 0),)] + ents + qs),
                outputs=tuple(range(woff, woff + n_in)), level=lvl)
        elif bkind.startswith("batch_inverse"):
            # BlueprintBatchInverse (blueprint_batch_inverse.go):
            # calldata = [size, n, linexps...]; outputs
            # wireOffset + 0..n-1; inverse of 0 is 0.
            j = start
            n_in = calldata[j + 1]
            j += 2
            ins = []
            for _ in range(n_in):
                e, j = _linexp(calldata, j + 1, calldata[j], coeffs, shift)
                ins.append(e)
            woff = raw["wire_offsets"][iid] + shift
            inst = Instruction(
                kind="hint", hint_name="gnark_batch_inverse",
                inputs=tuple(ins),
                outputs=tuple(range(woff, woff + n_in)), level=lvl)
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

    # commitments (constraint/commitment.go:9-26): map onto our
    # Commitment records and rename the placeholder hint to bsb22 so
    # the prover's commit-time override fires.
    ci = body.get("CommitmentInfo")
    if isinstance(ci, Tagged) and ci.value:
        kind_name = TAG_TO_KIND.get(ci.tag, "")
        for cm in ci.value:
            if kind_name == "groth16_commitments":
                pac = list(cm.get("PublicAndCommitmentCommitted") or [])
                priv = list(cm.get("PrivateCommitted") or [])
                rec = Commitment(
                    committed_wires=tuple(w + shift for w in pac + priv),
                    commitment_wire=cm["CommitmentIndex"] + shift,
                    hint_name="bsb22",
                    nb_public_committed=len(pac))
            elif kind_name == "plonk_commitments":
                rows = list(cm.get("Committed") or [])
                cm_row = cm["CommitmentIndex"]
                con = cs.sparse[cm_row]
                rec = Commitment(
                    committed_wires=tuple(cs.sparse[r].xa for r in rows),
                    commitment_wire=con.xa, hint_name="bsb22",
                    committed_rows=tuple(rows), commitment_row=cm_row)
            else:
                raise GnarkCSError(
                    f"unknown CommitmentInfo tag {ci.tag}")
            for inst in cs.instructions:
                if (inst.kind == "hint"
                        and rec.commitment_wire in inst.outputs):
                    inst.hint_name = "bsb22"
            cs.commitments.append(rec)

    want = body["NbConstraints"]
    if cs.nb_constraints != want:
        raise GnarkCSError(
            f"constraint count mismatch: decoded {cs.nb_constraints}, "
            f"body says {want}")
    return cs


# -- solver hints backing the mapped blueprints --------------------------------

@register_hint("gnark_lookup")
def _gnark_lookup_hint(q, inputs):
    """[nbEntries, entries..., queries...] -> entry values at the
    query indexes (BlueprintLookupHint.Solve semantics: out-of-range
    queries are solve-time errors)."""
    n = inputs[0]
    entries = inputs[1:1 + n]
    out = []
    for qv in inputs[1 + n:]:
        if qv >= n:
            raise ValueError(f"lookup query {qv} out of range {n}")
        out.append(entries[qv])
    return out


@register_hint("gnark_batch_inverse")
def _gnark_batch_inverse_hint(q, inputs):
    """Batch modular inversion; 0 -> 0
    (BlueprintBatchInverse.Solve)."""
    return [pow(x, -1, q) if x else 0 for x in inputs]


def load_gnark_cs(path: str) -> ConstraintSystem:
    with open(path, "rb") as f:
        return read_gnark_cs(f.read())
