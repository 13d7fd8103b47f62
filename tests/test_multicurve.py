"""Groth16 end-to-end on a second curve (BLS12-381) + debug/println."""

import random

import pytest

from gnark_tpu import fields
from gnark_tpu.backend import groth16
from gnark_tpu.constraint import SolverError, solve
from gnark_tpu.frontend import Circuit, Public, Secret, compile_circuit, witness


class Cubic381(Circuit):
    x: Secret
    y: Public

    def define(self, api):
        x3 = api.mul(self.x, self.x, self.x)
        api.assert_is_equal(api.add(x3, self.x, 5), self.y)


def test_groth16_bls12_381():
    cs = compile_circuit(Cubic381(), fields.BLS12_381_FR)
    rng = random.Random(11)
    pk, vk = groth16.setup(cs, "bls12_381", rng=rng)
    pub, sec = witness(Cubic381(x=3, y=35), cs)
    proof = groth16.prove(cs, pk, pub, sec, rng=rng)
    assert groth16.verify(proof, vk, pub)
    assert not groth16.verify(proof, vk, [36])


class Printer(Circuit):
    x: Secret

    def define(self, api):
        api.println("x = {} and x^2 = {}", self.x, api.mul(self.x, self.x))


def test_println(capsys):
    cs = compile_circuit(Printer(), fields.BN254_FR)
    pub, sec = witness(Printer(x=7), cs)
    solve(cs, pub, sec)
    assert "x = 7 and x^2 = 49" in capsys.readouterr().out


def test_debug_locations(monkeypatch):
    monkeypatch.setenv("GNARK_TPU_DEBUG", "1")

    class Bad(Circuit):
        x: Secret

        def define(self, api):
            api.assert_is_equal(self.x, 5)

    cs = compile_circuit(Bad(), fields.BN254_FR)
    pub, sec = witness(Bad(x=6), cs)
    with pytest.raises(SolverError, match="test_multicurve"):
        solve(cs, pub, sec)
