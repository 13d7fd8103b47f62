"""In-circuit Pedersen PoK verification (reference std/commitments/pedersen)."""

import random

import pytest

from gnark_tpu import fields
from gnark_tpu.backend import groth16
from gnark_tpu.ec import host
from gnark_tpu.frontend import Circuit, Public, Secret, compile_circuit, \
    witness
from gnark_tpu.std.math import emulated as emu
from gnark_tpu.test_engine import is_solved

RNG = random.Random(888)


class _Committed(Circuit):
    x: Secret
    y: Public

    def define(self, api):
        c = api.commit(self.x, api.mul(self.x, self.x))
        api.assert_is_equal(api.mul(self.y, 1), self.y)
        api.assert_is_equal(api.is_zero(c), 0)   # use the challenge


def _setup(curve_name, field):
    cs = compile_circuit(_Committed(), field)
    pk, vk = groth16.setup(cs, curve_name, rng=random.Random(41))
    pub, sec = witness(_Committed(x=5, y=7), cs)
    proof = groth16.prove(cs, pk, pub, sec, rng=random.Random(42))
    assert groth16.verify(proof, vk, pub)
    assert proof.commitments and proof.poks
    return vk, proof


@pytest.mark.slow
def test_pedersen_pok_377():
    vk, proof = _setup("bls12_377", fields.BLS12_377_FR)
    C = proof.commitments[0]
    pok = proof.poks[0]
    sigma = vk.commitment_g2_sigma[0]

    class Chk(Circuit):
        cx: Secret
        cy: Secret
        px: Secret
        py: Secret

        def define(self, api):
            from gnark_tpu.std.commitments.pedersen import assert_pok_377
            assert_pok_377(api, (self.cx, self.cy), (self.px, self.py),
                           sigma)

    good = Chk(cx=C[0], cy=C[1], px=pok[0], py=pok[1])
    assert is_solved(good, fields.BW6_761_FR)
    other = host.ec_mul(
        host.Fp(vk.curve.fp.modulus), C, 3)
    bad = Chk(cx=other[0], cy=other[1], px=pok[0], py=pok[1])
    assert not is_solved(bad, fields.BW6_761_FR)


@pytest.mark.slow
def test_pedersen_pok_bn254_emulated():
    vk, proof = _setup("bn254", fields.BN254_FR)
    C = proof.commitments[0]
    pok = proof.poks[0]
    sigma = vk.commitment_g2_sigma[0]

    def limbs(v):
        return [(v >> (emu.B * i)) & emu.MASK for i in range(emu.K)]

    class Chk(Circuit):
        ins: list[Secret]

        def __init__(self, **kw):
            self.ins = [None] * (4 * emu.K)
            super().__init__(**kw)

        def define(self, api):
            from gnark_tpu.std.commitments.pedersen import \
                assert_pok_bn254
            f = emu.EmulatedField(api, emu.BN254_FP_EMU)
            els = [f.from_limb_vars(self.ins[emu.K * i:emu.K * (i + 1)])
                   for i in range(4)]
            assert_pok_bn254(api, (els[0], els[1]), (els[2], els[3]),
                             sigma)

    good = Chk()
    good.ins = limbs(C[0]) + limbs(C[1]) + limbs(pok[0]) + limbs(pok[1])
    assert is_solved(good, fields.BN254_FR)
    other = host.ec_mul(host.Fp(vk.curve.fp.modulus), pok, 2)
    bad = Chk()
    bad.ins = limbs(C[0]) + limbs(C[1]) + limbs(other[0]) + limbs(other[1])
    assert not is_solved(bad, fields.BN254_FR)
