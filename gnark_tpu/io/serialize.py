"""Serialization: gnark-compatible witness format + native formats.

Interop (bit-compatible with the reference):
  * Witness binary (backend/witness/witness.go:15-37):
      [u32 nbPublic | u32 nbSecret | u32 len | elements big-endian],
    element width = field byte size. Public values first, then secret;
    the constant-one wire is NOT serialized.

Native formats (ours — the reference's CBOR+intcomp CS format,
constraint/marshal.go, is a follow-up interop target):
  * ConstraintSystem / keys / proofs serialize via a tagged, versioned
    JSON envelope with big-int fields hex-encoded. Simple, auditable,
    and stable; a packed binary fast path can come later without
    breaking the API (mirrors WriteDump/ReadDump vs WriteTo split,
    io/io.go).
"""

from __future__ import annotations

import json
import struct

from gnark_tpu.constraint.system import (
    Commitment, ConstraintSystem, Instruction, R1C, SparseR1C,
)
from gnark_tpu import fields

MAGIC = "gnark-tpu"
VERSION = 1


# ---------------------------------------------------------------------------
# gnark witness binary interop
# ---------------------------------------------------------------------------

def write_witness(public: list, secret: list, field: fields.FieldParams
                  ) -> bytes:
    nb = -(-field.bits // 8)
    out = struct.pack(">II", len(public), len(secret))
    vec = list(public) + list(secret)
    out += struct.pack(">I", len(vec))
    for v in vec:
        out += (v % field.modulus).to_bytes(nb, "big")
    return out


def read_witness(data: bytes, field: fields.FieldParams):
    nb = -(-field.bits // 8)
    nb_pub, nb_sec, ln = struct.unpack(">III", data[:12])
    off = 12
    vec = []
    for _ in range(ln):
        vec.append(int.from_bytes(data[off:off + nb], "big"))
        off += nb
    assert len(vec) == nb_pub + nb_sec
    return vec[:nb_pub], vec[nb_pub:]


# ---------------------------------------------------------------------------
# native constraint system format
# ---------------------------------------------------------------------------

def _h(v: int) -> str:
    return hex(v)


def _lc_out(e):
    return [[_h(c), w] for c, w in e]


def _lc_in(e):
    return tuple((int(c, 16), w) for c, w in e)


def dump_cs(cs: ConstraintSystem) -> bytes:
    doc = {
        "magic": MAGIC, "version": VERSION, "kind": cs.kind,
        "field": cs.field.name,
        "public_names": cs.public_names,
        "secret_names": cs.secret_names,
        "nb_internal": cs.nb_internal,
        "r1cs": [[_lc_out(c.l), _lc_out(c.r), _lc_out(c.o)]
                 for c in cs.r1cs],
        "sparse": [[c.xa, c.xb, c.xo, _h(c.qL), _h(c.qR), _h(c.qO),
                    _h(c.qM), _h(c.qC)] for c in cs.sparse],
        "instructions": [
            {"k": i.kind, "c": i.cidx, "h": i.hint_name,
             "i": [_lc_out(e) for e in i.inputs],
             "o": list(i.outputs), "l": i.level}
            for i in cs.instructions],
        "levels": cs.levels,
        "commitments": [
            {"wires": list(c.committed_wires),
             "cwire": c.commitment_wire, "hint": c.hint_name}
            for c in cs.commitments],
        "logs": [[fmt, [_lc_out(e) for e in args]]
                 for fmt, args in cs.logs],
    }
    return json.dumps(doc, separators=(",", ":")).encode()


def load_cs(data: bytes) -> ConstraintSystem:
    doc = json.loads(data)
    assert doc["magic"] == MAGIC and doc["version"] == VERSION
    cs = ConstraintSystem(fields.FIELDS[doc["field"]], doc["kind"])
    cs.public_names = doc["public_names"]
    cs.secret_names = doc["secret_names"]
    cs.nb_internal = doc["nb_internal"]
    cs.r1cs = [R1C(_lc_in(l), _lc_in(r), _lc_in(o))
               for l, r, o in doc["r1cs"]]
    cs.sparse = [SparseR1C(xa=a, xb=b, xo=o, qL=int(ql, 16),
                           qR=int(qr, 16), qO=int(qo, 16),
                           qM=int(qm, 16), qC=int(qc, 16))
                 for a, b, o, ql, qr, qo, qm, qc in doc["sparse"]]
    cs.instructions = [
        Instruction(kind=d["k"], cidx=d["c"], hint_name=d["h"],
                    inputs=tuple(_lc_in(e) for e in d["i"]),
                    outputs=tuple(d["o"]), level=d["l"])
        for d in doc["instructions"]]
    cs.levels = [list(l) for l in doc["levels"]]
    cs.commitments = [
        Commitment(committed_wires=tuple(d["wires"]),
                   commitment_wire=d["cwire"], hint_name=d["hint"])
        for d in doc["commitments"]]
    cs.logs = [(fmt, tuple(_lc_in(e) for e in args))
               for fmt, args in doc["logs"]]
    # rebuild wire levels
    for iid, inst in enumerate(cs.instructions):
        for w in inst.outputs:
            cs._wire_level[w] = inst.level
    return cs


# ---------------------------------------------------------------------------
# points / proofs / keys
# ---------------------------------------------------------------------------

def _pt_out(P):
    if P is None:
        return None
    def c(v):
        return [_h(v[0]), _h(v[1])] if isinstance(v, tuple) else _h(v)
    return [c(P[0]), c(P[1])]


def _pt_in(d):
    if d is None:
        return None
    def c(v):
        return (int(v[0], 16), int(v[1], 16)) if isinstance(v, list) \
            else int(v, 16)
    return (c(d[0]), c(d[1]))


def dump_groth16_proof(proof) -> bytes:
    doc = {"magic": MAGIC, "version": VERSION, "type": "groth16.proof",
           "ar": _pt_out(proof.ar), "krs": _pt_out(proof.krs),
           "bs": _pt_out(proof.bs),
           "commitments": [_pt_out(p) for p in proof.commitments],
           "poks": [_pt_out(p) for p in proof.poks]}
    return json.dumps(doc, separators=(",", ":")).encode()


def load_groth16_proof(data: bytes):
    from gnark_tpu.backend.groth16 import Proof
    doc = json.loads(data)
    assert doc["type"] == "groth16.proof"
    return Proof(ar=_pt_in(doc["ar"]), krs=_pt_in(doc["krs"]),
                 bs=_pt_in(doc["bs"]),
                 commitments=[_pt_in(p)
                              for p in doc.get("commitments", [])],
                 poks=[_pt_in(p) for p in doc.get("poks", [])])


def dump_groth16_vk(vk) -> bytes:
    doc = {"magic": MAGIC, "version": VERSION, "type": "groth16.vk",
           "curve": vk.curve.name,
           "g1_k": [_pt_out(p) for p in vk.g1_k],
           "g2_gamma_neg": _pt_out(vk.g2_gamma_neg),
           "g2_delta_neg": _pt_out(vk.g2_delta_neg),
           "g1_alpha": _pt_out(vk.g1_alpha),
           "g2_beta": _pt_out(vk.g2_beta),
           "g2_gamma": _pt_out(vk.g2_gamma),
           "g2_delta": _pt_out(vk.g2_delta),
           "commitment_g2_sigma": [_pt_out(p)
                                   for p in vk.commitment_g2_sigma]}
    return json.dumps(doc, separators=(",", ":")).encode()


def load_groth16_vk(data: bytes):
    from gnark_tpu.backend.groth16 import VerifyingKey
    from gnark_tpu.ec.curves import CURVES
    from gnark_tpu.pairing import get_pairing
    doc = json.loads(data)
    assert doc["type"] == "groth16.vk"
    curve = CURVES[doc["curve"]]
    g1_alpha = _pt_in(doc["g1_alpha"])
    g2_beta = _pt_in(doc["g2_beta"])
    pairing = get_pairing(curve.name)
    return VerifyingKey(
        curve=curve, g1_k=[_pt_in(p) for p in doc["g1_k"]],
        g2_gamma_neg=_pt_in(doc["g2_gamma_neg"]),
        g2_delta_neg=_pt_in(doc["g2_delta_neg"]),
        e_alpha_beta=pairing.pair(g1_alpha, g2_beta),
        g1_alpha=g1_alpha, g2_beta=g2_beta,
        g2_gamma=_pt_in(doc["g2_gamma"]), g2_delta=_pt_in(doc["g2_delta"]),
        commitment_g2_sigma=[_pt_in(p)
                             for p in doc.get("commitment_g2_sigma", [])])


def dump_plonk_proof(proof) -> bytes:
    doc = {"magic": MAGIC, "version": VERSION, "type": "plonk.proof",
           "lro": [_pt_out(p) for p in proof.lro],
           "z": _pt_out(proof.z), "h": [_pt_out(p) for p in proof.h],
           "batched_h": _pt_out(proof.batched_h),
           "claimed": [_h(v) for v in proof.claimed],
           "z_shift_h": _pt_out(proof.z_shift_h), "zu": _h(proof.zu),
           "bsb22": [_pt_out(p) for p in proof.bsb22]}
    return json.dumps(doc, separators=(",", ":")).encode()


def load_plonk_proof(data: bytes):
    from gnark_tpu.backend.plonk import PlonkProof
    doc = json.loads(data)
    assert doc["type"] == "plonk.proof"
    return PlonkProof(
        lro=[_pt_in(p) for p in doc["lro"]], z=_pt_in(doc["z"]),
        h=[_pt_in(p) for p in doc["h"]],
        batched_h=_pt_in(doc["batched_h"]),
        claimed=[int(v, 16) for v in doc["claimed"]],
        z_shift_h=_pt_in(doc["z_shift_h"]), zu=int(doc["zu"], 16),
        bsb22=[_pt_in(p) for p in doc.get("bsb22", [])])


def witness_to_json(assigned, cs) -> str:
    """Schema-named JSON witness (reference backend/witness JSON via
    schema): {"public": {path: "0x..", ...}, "secret": {...}}."""
    import json
    from gnark_tpu.frontend.circuit import _walk
    q = cs.q
    out = {"public": {}, "secret": {}}

    def collect(section):
        def visit(path, get, set_):
            v = get()
            if v is None or not isinstance(v, int):
                raise ValueError(f"{path}: missing assignment")
            out[section][path] = hex(int(v) % q)
        return visit

    _walk(assigned, "public", collect("public"))
    _walk(assigned, "secret", collect("secret"))
    return json.dumps(out, indent=1, sort_keys=True)


def witness_from_json(circuit, data: str):
    """Fill an (unassigned) circuit instance from schema-named JSON;
    returns the instance."""
    import json
    from gnark_tpu.frontend.circuit import _walk
    vals = json.loads(data)

    def fill(section):
        def visit(path, get, set_):
            if path not in vals[section]:
                raise ValueError(f"{path}: missing in JSON witness")
            set_(int(vals[section][path], 0))
        return visit

    _walk(circuit, "public", fill("public"))
    _walk(circuit, "secret", fill("secret"))
    return circuit
