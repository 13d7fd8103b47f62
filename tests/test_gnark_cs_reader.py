"""gnark constraint-system (.r1cs/.scs) reader interop gate.

Fixtures are gnark-generated binaries checked in verbatim from the
reference (internal/regression_tests/issue1045/testdata/): a BN254
circuit with two public inputs, two hints and two equality
constraints (issue_1045_test.go:47-62). The gate: our reader must
parse them byte-for-byte, our solver must accept the same witness
gnark's test uses (In1=123, In2=333, identity hints), and the decoded
systems must prove and verify under our backends.
"""

import os
import random

import pytest

from gnark_tpu.io.gnark_cs import load_gnark_cs, parse_gnark_cs
from gnark_tpu.constraint import solver

DATA = os.path.join(os.path.dirname(__file__), "data", "gnark_fixtures")

HINTS = {
    "github.com/consensys/gnark/internal/regression_tests/"
    "issue1045.ExplicitHint": lambda q, ins: [ins[0] % q],
    "github.com/consensys/gnark/internal/regression_tests/"
    "issue1045.glob..func1": lambda q, ins: [ins[0] % q],
}


def test_parse_sections_r1cs():
    with open(os.path.join(DATA, "issue1045.r1cs"), "rb") as f:
        raw = parse_gnark_cs(f.read())
    assert raw["field"].name == "bn254_fr"
    assert raw["blueprint_ids"] == [0, 0, 1, 1]
    assert raw["constraint_offsets"] == [0, 0, 0, 1]
    assert raw["wire_offsets"] == [4, 5, 5, 5]
    assert raw["calldata_starts"] == [0, 8, 16, 26]
    assert raw["levels"] == [[0, 1], [2, 3]]
    assert len(raw["calldata"]) == 36
    # coeff table: [0, 1, 2, -1, -2] (constraint/bn254/coeff.go)
    q = raw["field"].modulus
    assert raw["coeffs"] == [0, 1, 2, q - 1, q - 2]
    assert raw["body"]["GnarkVersion"].startswith("0.")


def test_r1cs_solve_and_groth16():
    cs = load_gnark_cs(os.path.join(DATA, "issue1045.r1cs"))
    assert cs.kind == "r1cs" and cs.nb_constraints == 2
    sol = solver.solve(cs, [123, 333], [], hint_overrides=HINTS)
    assert sol.values[3] == 123 and sol.values[4] == 333

    # wrong witness must fail (the hint output no longer matches)
    bad = dict(HINTS)
    k = next(iter(bad))
    bad[k] = lambda q, ins: [(ins[0] + 1) % q]
    with pytest.raises(solver.SolverError):
        solver.solve(cs, [123, 333], [], hint_overrides=bad)

    from gnark_tpu.backend import groth16
    pk, vk = groth16.setup(cs, "bn254", rng=random.Random(11))
    proof = groth16.prove(cs, pk, [123, 333], [],
                          rng=random.Random(12), hint_overrides=HINTS)
    assert groth16.verify(proof, vk, [123, 333])
    assert not groth16.verify(proof, vk, [123, 334])


def test_scs_solve_and_plonk():
    cs = load_gnark_cs(os.path.join(DATA, "issue1045.scs"))
    assert cs.kind == "scs" and cs.nb_constraints == 2
    sol = solver.solve(cs, [123, 333], [], hint_overrides=HINTS)
    assert sol.values[3] == 123 and sol.values[4] == 333

    from gnark_tpu.backend import kzg, plonk
    srs = kzg.setup_srs("bn254", 64, rng=random.Random(21))
    pk, vk = plonk.setup(cs, srs)
    proof = plonk.prove(cs, pk, [123, 333], [],
                        rng=random.Random(22), hint_overrides=HINTS)
    assert plonk.verify(proof, vk, [123, 333])
    assert not plonk.verify(proof, vk, [124, 333])


# -- writer / intcomp full-block interop (round 4) ---------------------------

def _fixture_bytes(name):
    with open(os.path.join(DATA, name), "rb") as f:
        return f.read()


def test_writer_byte_identity():
    """Re-encoding a parsed gnark fixture reproduces it byte-for-byte
    (pins the CBOR core-det encoder, intcomp tail blocks, uvarint
    calldata, coeff table and wrapper against real gnark output)."""
    from gnark_tpu.io.gnark_cs_writer import write_gnark_raw
    for name in ("issue1045.r1cs", "issue1045.scs"):
        data = _fixture_bytes(name)
        assert write_gnark_raw(parse_gnark_cs(data)) == data


def _go_quoted_bytes(b: bytes) -> bytes:
    """Decode the inside of a Go double-quoted byte-string literal."""
    out = bytearray()
    i = 0
    esc = {ord("n"): 10, ord("t"): 9, ord("r"): 13, ord('"'): 34,
           ord("\\"): 92, ord("a"): 7, ord("b"): 8, ord("f"): 12,
           ord("v"): 11, ord("0"): 0}
    while i < len(b):
        c = b[i]
        if c == 0x5C:  # backslash
            n = b[i + 1]
            if n == ord("x"):
                out.append(int(b[i + 2:i + 4], 16))
                i += 4
            elif n == ord("u"):
                out += chr(int(b[i + 2:i + 6], 16)).encode()
                i += 6
            else:
                out.append(esc[n])
                i += 2
        else:
            out.append(c)
            i += 1
    return bytes(out)


def test_intcomp_roundtrip_fuzz_corpus():
    """Round-trip the reference's intcomp fuzz corpus inputs
    (internal/backend/ioutils/testdata/fuzz/FuzzIntcomp32: raw bytes
    reinterpreted as little-endian u32s, like intcomp_test.go:12-15)
    plus synthetic >=128-value streams through our codec."""
    from gnark_tpu.io import intcomp

    corpus_dir = os.path.join(
        "/root/reference/internal/backend/ioutils/testdata/fuzz",
        "FuzzIntcomp32")
    cases = []
    if os.path.isdir(corpus_dir):
        for fn in sorted(os.listdir(corpus_dir)):
            with open(os.path.join(corpus_dir, fn), "rb") as f:
                txt = f.read()
            # go fuzz corpus file: line 2 is `[]byte("...")`
            for line in txt.splitlines():
                if line.startswith(b"[]byte("):
                    raw = _go_quoted_bytes(line[8:-2])
                    vals = [int.from_bytes(raw[4 * i:4 * i + 4], "little")
                            for i in range(len(raw) // 4)]
                    cases.append(vals)
    rng = random.Random(7)
    cases += [
        [],
        [0] * 500,
        list(range(1000)),
        [rng.randrange(1 << 32) for _ in range(777)],
        [rng.randrange(1 << 10) * 1024 for _ in range(256)],
    ]
    for vals in cases:
        assert intcomp.decompress_u32(intcomp.compress_u32(vals)) == vals
    for vals in ([], [2 ** 63] * 300, list(range(5000)),
                 [rng.randrange(1 << 64) for _ in range(513)]):
        assert intcomp.decompress_u64(intcomp.compress_u64(vals)) == vals


class _ChainCircuit:
    """v <- v*v + i chain: N mul + N add constraints (R1CS) or 2N
    gates (SCS), > 128 instructions -> full intcomp blocks."""

    def __new__(cls, n):
        from gnark_tpu.frontend import Circuit, Public, Secret

        class Chain(Circuit):
            x: Secret
            y: Public

            def define(self, api):
                v = self.x
                for i in range(n):
                    v = api.add(api.mul(v, v), i)
                api.assert_is_equal(v, self.y)

        return Chain

    @staticmethod
    def expected(n, x, q):
        v = x
        for i in range(n):
            v = (v * v + i) % q
        return v


def _export_reload_prove(n, backend):
    from gnark_tpu import fields
    from gnark_tpu.frontend import compile_circuit, witness
    from gnark_tpu.io.gnark_cs import read_gnark_cs
    from gnark_tpu.io.gnark_cs_writer import cs_to_gnark_bytes

    F = fields.BN254_FR
    Chain = _ChainCircuit(n)
    y = _ChainCircuit.expected(n, 7, F.modulus)

    if backend == "groth16":
        cs = compile_circuit(Chain(), F)
    else:
        from gnark_tpu.frontend.scs import SCSBuilder
        cs = compile_circuit(Chain(), F, builder_cls=SCSBuilder)

    blob = cs_to_gnark_bytes(cs)
    cs2 = read_gnark_cs(blob)
    assert cs2.nb_constraints == cs.nb_constraints
    pub, sec = witness(Chain(x=7, y=y), cs)
    s1 = solver.solve(cs, pub, sec)
    s2 = solver.solve(cs2, pub, sec)
    assert s1.values == s2.values

    if backend == "groth16":
        from gnark_tpu.backend import groth16
        pk, vk = groth16.setup(cs2, "bn254", rng=random.Random(5))
        proof = groth16.prove(cs2, pk, pub, sec, rng=random.Random(6))
        assert groth16.verify(proof, vk, pub)
        assert not groth16.verify(proof, vk, [(y + 1) % F.modulus])
    else:
        from gnark_tpu.backend import kzg, plonk
        srs = kzg.setup_srs(
            "bn254", (1 << (cs2.nb_constraints + 16).bit_length()) + 8,
            rng=random.Random(7))
        pk, vk = plonk.setup(cs2, srs)
        proof = plonk.prove(cs2, pk, pub, sec, rng=random.Random(8))
        assert plonk.verify(proof, vk, pub)
        assert not plonk.verify(proof, vk, [(y + 1) % F.modulus])


def test_export_reload_groth16_fullblocks():
    # 200 instructions > 128 -> bit-packed intcomp blocks exercised
    _export_reload_prove(100, "groth16")


def test_export_reload_plonk_fullblocks():
    _export_reload_prove(80, "plonk")


@pytest.mark.slow
def test_export_reload_groth16_2pow12():
    # the VERDICT gate: >= 2^12-constraint gnark-format circuit loads,
    # solves and proves
    _export_reload_prove(2100, "groth16")


def test_lookup_blueprint_fixture():
    """Synthesize a gnark SCS with a BlueprintLookupHint (layout per
    constraint/blueprint_logderivlookup.go:31-74) and check our
    reader solves the queries from the table."""
    from gnark_tpu import fields
    from gnark_tpu.io.gnark_cs import Tagged, read_gnark_cs
    from gnark_tpu.io.gnark_cs_writer import (
        KIND_TO_TAG, write_gnark_raw)

    F = fields.BN254_FR
    # gnark wires (no constant wire): 0 = public In, 1..2 secret
    # T0,T1; internal 3 = lookup output. Table entries: {1*T0, 1*T1};
    # query: In. One scs_add constraint pins out == out (trivial row
    # so NbConstraints>0).
    entries_calldata = [1, 1, 1, 1, 1, 2]   # two 1-term linexps
    lookup_cd = [6, 2, 1, 1, 1, 0]          # size,nbE,nbIn,len1,(cid1,w0)
    add_cd = [3, 3, 3, 1, 0, 0]             # qL*x3 + qR*x3 + qC == x3
    body = {
        "GnarkVersion": "0.14.0",
        "ScalarField": format(F.modulus, "x"),
        "Type": 2,
        "Blueprints": [
            Tagged(KIND_TO_TAG["lookup_u64"],
                   {"EntriesCalldata": entries_calldata}),
            Tagged(KIND_TO_TAG["scs_add_u64"], {}),
        ],
        "NbConstraints": 1,
        "NbInternalVariables": 1,
        "Public": ["In"],
        "Secret": ["T0", "T1"],
        "Logs": None,
        "DebugInfo": None,
        "GkrInfo": None,
        "SymbolTable": {"Functions": None, "Locations": None},
        "MDebug": {},
        "MHintsDependencies": {},
        "CommitmentInfo": Tagged(KIND_TO_TAG["plonk_commitments"], []),
    }
    raw = {
        "field": F, "version": (0, 14, 0),
        "levels": [[0], [1]],
        "blueprint_ids": [0, 1],
        "constraint_offsets": [0, 0],
        "wire_offsets": [3, 4],
        "calldata_starts": [0, 6],
        "calldata": lookup_cd + add_cd,
        "body": body,
        "coeffs": [0, 1, 2, F.modulus - 1, F.modulus - 2],
    }
    cs = read_gnark_cs(write_gnark_raw(raw))
    # query index 1 -> T1's value
    sol = solver.solve(cs, [1], [111, 222])
    assert sol.values[4] == 222
    sol = solver.solve(cs, [0], [111, 222])
    assert sol.values[4] == 111
    with pytest.raises(Exception):
        solver.solve(cs, [2], [111, 222])   # out-of-range query


def test_batch_inverse_blueprint_fixture():
    """Synthesize a gnark R1CS with BlueprintBatchInverse (layout per
    constraint/blueprint_batch_inverse.go) and check inverse
    semantics incl. 0 -> 0."""
    from gnark_tpu import fields
    from gnark_tpu.io.gnark_cs import Tagged, read_gnark_cs
    from gnark_tpu.io.gnark_cs_writer import (
        KIND_TO_TAG, write_gnark_raw)

    F = fields.BN254_FR
    q = F.modulus
    # R1CS wires: 0 = const 1, 1..2 public In1,In2; internal 3,4 =
    # their inverses; one r1c checks In1 * inv(In1) == 1.
    binv_cd = [6, 2, 1, 1, 1, 1, 1, 2]      # size,n=2,(len1,1,w1),(len1,1,w2)
    r1c_cd = [10, 1, 1, 1, 1, 1, 1, 3, 1, 0]
    body = {
        "GnarkVersion": "0.14.0",
        "ScalarField": format(q, "x"),
        "Type": 1,
        "Blueprints": [
            Tagged(KIND_TO_TAG["batch_inverse_u64"], {}),
            Tagged(KIND_TO_TAG["r1c"], {}),
        ],
        "NbConstraints": 1,
        "NbInternalVariables": 2,
        "Public": ["1", "In1", "In2"],
        "Secret": None,
        "Logs": None,
        "DebugInfo": None,
        "GkrInfo": None,
        "SymbolTable": {"Functions": None, "Locations": None},
        "MDebug": {},
        "MHintsDependencies": {},
        "CommitmentInfo": Tagged(KIND_TO_TAG["groth16_commitments"], []),
    }
    raw = {
        "field": F, "version": (0, 14, 0),
        "levels": [[0], [1]],
        "blueprint_ids": [0, 1],
        "constraint_offsets": [0, 0],
        "wire_offsets": [3, 5],
        "calldata_starts": [0, 8],
        "calldata": binv_cd + r1c_cd,
        "body": body,
        "coeffs": [0, 1, 2, q - 1, q - 2],
    }
    cs = read_gnark_cs(write_gnark_raw(raw))
    sol = solver.solve(cs, [5, 0], [])
    assert sol.values[3] == pow(5, -1, q)
    assert sol.values[4] == 0               # inverse of 0 is 0
