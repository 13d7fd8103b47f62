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
