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


def test_groth16_with_hints():
    cs = compile_circuit(HintCircuit(), fields.BN254_FR)
    rng = random.Random(7)
    pk, vk = groth16.setup(cs, "bn254", rng=rng)
    pub, sec = witness(HintCircuit(x=0xA7, nibble=0x7), cs)
    proof = groth16.prove(cs, pk, pub, sec, rng=rng)
    assert groth16.verify(proof, vk, pub)
    assert not groth16.verify(proof, vk, [0x8])
