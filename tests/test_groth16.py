"""End-to-end Groth16: compile -> setup -> prove -> verify.

The minimum end-to-end slice from SURVEY.md §7 (cubic circuit), plus
negative tests (wrong public input must not verify).
"""

import random

import pytest

from gnark_tpu import fields
from gnark_tpu.backend import groth16
from gnark_tpu.frontend import Circuit, Public, Secret, compile_circuit, witness


class Cubic(Circuit):
    """x**3 + x + 5 == y (reference examples/cubic)."""
    x: Secret
    y: Public

    def define(self, api):
        x3 = api.mul(self.x, self.x, self.x)
        api.assert_is_equal(api.add(x3, self.x, 5), self.y)


@pytest.fixture(scope="module")
def cubic_setup():
    cs = compile_circuit(Cubic(), fields.BN254_FR)
    rng = random.Random(42)
    pk, vk = groth16.setup(cs, "bn254", rng=rng)
    return cs, pk, vk


def test_groth16_cubic_roundtrip(cubic_setup):
    cs, pk, vk = cubic_setup
    pub, sec = witness(Cubic(x=3, y=35), cs)
    proof = groth16.prove(cs, pk, pub, sec, rng=random.Random(1))
    assert groth16.verify(proof, vk, pub)


def test_groth16_wrong_public(cubic_setup):
    cs, pk, vk = cubic_setup
    pub, sec = witness(Cubic(x=3, y=35), cs)
    proof = groth16.prove(cs, pk, pub, sec, rng=random.Random(2))
    assert not groth16.verify(proof, vk, [36])


def test_groth16_tampered_proof(cubic_setup):
    cs, pk, vk = cubic_setup
    pub, sec = witness(Cubic(x=3, y=35), cs)
    p1 = groth16.prove(cs, pk, pub, sec, rng=random.Random(3))
    p2 = groth16.prove(cs, pk, pub, sec, rng=random.Random(4))
    tampered = groth16.Proof(ar=p1.ar, krs=p2.krs, bs=p1.bs)
    assert not groth16.verify(tampered, vk, pub)


class HintCircuit(Circuit):
    """Exercises hints + binary decomposition through the full stack."""
    x: Secret
    nibble: Public

    def define(self, api):
        bits = api.to_binary(self.x, 8)
        api.assert_is_equal(api.from_binary(bits[:4]), self.nibble)
        api.assert_is_equal(api.is_zero(api.sub(self.x, 0xA7)), 1)


@pytest.mark.slow
def test_groth16_with_hints():
    cs = compile_circuit(HintCircuit(), fields.BN254_FR)
    rng = random.Random(7)
    pk, vk = groth16.setup(cs, "bn254", rng=rng)
    pub, sec = witness(HintCircuit(x=0xA7, nibble=0x7), cs)
    proof = groth16.prove(cs, pk, pub, sec, rng=rng)
    assert groth16.verify(proof, vk, pub)
    assert not groth16.verify(proof, vk, [0x8])


class CommitCircuit(Circuit):
    """BSB22 commitment: challenge-style usage (reference
    std/multicommit pattern)."""
    x: Secret
    y: Public

    def define(self, api):
        x2 = api.mul(self.x, self.x)
        c = api.commit(self.x, x2)
        # use the challenge: assert c*(x - y) == c*x - c*y (trivially
        # true) plus bind y = x^2 so the circuit is meaningful
        api.assert_is_equal(x2, self.y)
        t = api.mul(c, api.sub(self.x, self.y))
        api.assert_is_equal(t, api.sub(api.mul(c, self.x),
                                       api.mul(c, self.y)))


@pytest.mark.slow
def test_groth16_commitment():
    cs = compile_circuit(CommitCircuit(), fields.BN254_FR)
    assert len(cs.commitments) == 1
    rng = random.Random(9)
    pk, vk = groth16.setup(cs, "bn254", rng=rng)
    pub, sec = witness(CommitCircuit(x=6, y=36), cs)
    proof = groth16.prove(cs, pk, pub, sec, rng=rng)
    assert len(proof.commitments) == 1
    assert groth16.verify(proof, vk, pub)
    assert not groth16.verify(proof, vk, [35])
    # tampered commitment point must fail (PoK or equation)
    bad = groth16.Proof(ar=proof.ar, krs=proof.krs, bs=proof.bs,
                        commitments=[proof.poks[0]], poks=proof.poks)
    assert not groth16.verify(bad, vk, pub)


@pytest.mark.slow
def test_groth16_lookup_commitment():
    """Regression: Pedersen basis must pair with committed values in
    committed_wires ORDER (not wire-id order) — lookup circuits commit
    wires out of allocation order."""
    from gnark_tpu.std.lookup import Table
    SBOX = [((7 * i + 3) ** 2) % 251 for i in range(16)]

    class LookupCircuit(Circuit):
        x: Secret
        y: Public

        def define(self, api):
            t = Table(api)
            for v in SBOX:
                t.insert(v)
            api.assert_is_equal(t.lookup(self.x)[0], self.y)

    cs = compile_circuit(LookupCircuit(), fields.BN254_FR)
    pk, vk = groth16.setup(cs, "bn254", rng=random.Random(5))
    pub, sec = witness(LookupCircuit(x=9, y=SBOX[9]), cs)
    proof = groth16.prove(cs, pk, pub, sec)
    assert groth16.verify(proof, vk, pub)
    assert not groth16.verify(proof, vk, [SBOX[8]])


@pytest.mark.slow
def test_dummy_setup_prove_path():
    """DummySetup: O(1) fake pk drives the full prove pipeline
    (benchmarking path; proofs intentionally do not verify)."""
    cs = compile_circuit(Cubic(), fields.BN254_FR)
    pk = groth16.dummy_setup(cs, "bn254")
    pub, sec = witness(Cubic(x=3, y=35), cs)
    proof = groth16.prove(cs, pk, pub, sec, rng=random.Random(2))
    assert proof.ar is not None and proof.bs is not None
