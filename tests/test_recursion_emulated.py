"""Emulated recursion stack: in-circuit KZG opening verification and
Groth16 proof verification for BN254 artifacts inside a BN254-scalar
circuit (reference std/recursion/groth16 + std/commitments/kzg with
the sw_bn254 emulated curve)."""

import random

import pytest

from gnark_tpu import fields
from gnark_tpu.backend import groth16, kzg
from gnark_tpu.ec.curves import CURVES
from gnark_tpu.frontend import Circuit, Public, Secret, compile_circuit, \
    witness
from gnark_tpu.std.math import emulated as emu
from gnark_tpu.std.recursion.groth16 import (assert_proof_bn254,
                                             load_proof_bn254,
                                             proof_witness_bn254)
from gnark_tpu.test_engine import is_solved

F = fields.BN254_FR
C254 = CURVES["bn254"]
RNG = random.Random(5150)


def limbs(v):
    return [(v >> (emu.B * i)) & emu.MASK for i in range(emu.K)]


# -- KZG ---------------------------------------------------------------------

class _KzgCheck(Circuit):
    c_limbs: list[Secret]
    w_limbs: list[Secret]
    z: Public
    y: Public

    srs_g2_tau = None            # constant, set per-test

    def __init__(self, **kw):
        self.c_limbs = [None] * (2 * emu.K)
        self.w_limbs = [None] * (2 * emu.K)
        super().__init__(**kw)

    def define(self, api):
        from gnark_tpu.std.commitments.kzg import KZGVerifierBN254
        v = KZGVerifierBN254(api, type(self).srs_g2_tau)
        fe = v.g1.fe
        c = (fe.from_limb_vars(self.c_limbs[:emu.K]),
             fe.from_limb_vars(self.c_limbs[emu.K:]))
        w = (fe.from_limb_vars(self.w_limbs[:emu.K]),
             fe.from_limb_vars(self.w_limbs[emu.K:]))
        v.check_opening(c, w, self.z, self.y)


@pytest.mark.slow
def test_in_circuit_kzg_bn254():
    q = C254.fr.modulus
    srs = kzg.setup_srs("bn254", 8, rng=random.Random(7))
    coeffs = [RNG.randrange(q) for _ in range(6)]
    com = kzg.commit(srs, coeffs)
    z = RNG.randrange(2, q)
    proof = kzg.open_at(srs, coeffs, z)
    assert kzg.verify_opening(srs, com, proof, z)

    _KzgCheck.srs_g2_tau = srs.g2_tau
    inst = _KzgCheck(z=z, y=proof.claimed_value)
    inst.c_limbs = limbs(com[0]) + limbs(com[1])
    inst.w_limbs = limbs(proof.h[0]) + limbs(proof.h[1])
    assert is_solved(inst, F)

    bad = _KzgCheck(z=z, y=(proof.claimed_value + 1) % q)
    bad.c_limbs = inst.c_limbs
    bad.w_limbs = inst.w_limbs
    assert not is_solved(bad, F)


@pytest.mark.slow
def test_in_circuit_kzg_377_native():
    c377 = CURVES["bls12_377"]
    q = c377.fr.modulus
    srs = kzg.setup_srs("bls12_377", 8, rng=random.Random(8))
    coeffs = [RNG.randrange(q) for _ in range(6)]
    com = kzg.commit(srs, coeffs)
    z = RNG.randrange(2, q)
    proof = kzg.open_at(srs, coeffs, z)

    class _K377(Circuit):
        cx: Secret
        cy: Secret
        wx: Secret
        wy: Secret
        z: Public
        y: Public

        def define(self, api):
            from gnark_tpu.std.commitments.kzg import KZGVerifier377
            v = KZGVerifier377(api, srs.g2_tau)
            v.check_opening((self.cx, self.cy), (self.wx, self.wy),
                            self.z, self.y)

    inst = _K377(cx=com[0], cy=com[1], wx=proof.h[0], wy=proof.h[1],
                 z=z, y=proof.claimed_value)
    assert is_solved(inst, fields.BW6_761_FR)
    bad = _K377(cx=com[0], cy=com[1], wx=proof.h[0], wy=proof.h[1],
                z=z, y=(proof.claimed_value + 1) % q)
    assert not is_solved(bad, fields.BW6_761_FR)


# -- Groth16 emulated --------------------------------------------------------

class _Cubic(Circuit):
    x: Secret
    y: Public

    def define(self, api):
        x3 = api.mul(self.x, self.x, self.x)
        api.assert_is_equal(api.add(x3, self.x, 5), self.y)


@pytest.fixture(scope="module")
def inner_proof_bn254():
    ics = compile_circuit(_Cubic(), fields.BN254_FR)
    ipk, ivk = groth16.setup(ics, "bn254", rng=random.Random(21))
    pub, sec = witness(_Cubic(x=3, y=35), ics)
    proof = groth16.prove(ics, ipk, pub, sec, rng=random.Random(22))
    assert groth16.verify(proof, ivk, pub)
    return ivk, proof


class _Outer(Circuit):
    proof_limbs: list[Secret]
    inner_y: Public

    ivk = None

    def __init__(self, **kw):
        self.proof_limbs = [None] * (8 * emu.K)
        super().__init__(**kw)

    def define(self, api):
        from gnark_tpu.std.math import emulated as _e
        fe = _e.EmulatedField(api, _e.BN254_FP_EMU)
        pv = load_proof_bn254(fe, self.proof_limbs)
        assert_proof_bn254(api, type(self).ivk, pv, [self.inner_y])


@pytest.mark.slow
def test_in_circuit_groth16_verify_emulated(inner_proof_bn254):
    ivk, proof = inner_proof_bn254
    _Outer.ivk = ivk
    w = proof_witness_bn254(proof)
    good = _Outer(inner_y=35)
    good.proof_limbs = w
    assert is_solved(good, F)
    # wrong public input
    bad = _Outer(inner_y=36)
    bad.proof_limbs = w
    assert not is_solved(bad, F)
    # tampered proof point
    w2 = list(w)
    w2[0] = (w2[0] + 1) % (1 << emu.B)
    bad2 = _Outer(inner_y=35)
    bad2.proof_limbs = w2
    assert not is_solved(bad2, F)


# -- Groth16 emulated, COMMITMENT circuits (round-5: the pedersen leg) -------

class _InnerCommit(Circuit):
    x: Secret
    y: Public

    def define(self, api):
        c = api.commit(self.x)
        api.assert_is_different(c, 0)
        api.assert_is_equal(api.mul(self.x, self.x), self.y)


class _OuterCommit(Circuit):
    proof_limbs: list[Secret]
    inner_y: Public

    ivk = None

    def __init__(self, **kw):
        self.proof_limbs = [None] * ((8 + 4) * emu.K)
        super().__init__(**kw)

    def define(self, api):
        from gnark_tpu.std.math import emulated as _e
        fe = _e.EmulatedField(api, _e.BN254_FP_EMU)
        pv = load_proof_bn254(fe, self.proof_limbs, nb_commitments=1)
        assert_proof_bn254(api, type(self).ivk, pv, [self.inner_y])


@pytest.mark.slow
def test_in_circuit_groth16_verify_emulated_commitment():
    ics = compile_circuit(_InnerCommit(), fields.BN254_FR)
    ipk, ivk = groth16.setup(ics, "bn254", rng=random.Random(31))
    pub, sec = witness(_InnerCommit(x=6, y=36), ics)
    proof = groth16.prove(ics, ipk, pub, sec, rng=random.Random(32),
                          recursion_friendly="self")
    assert groth16.verify(proof, ivk, pub, recursion_friendly="self")
    assert len(proof.commitments) == 1 and len(proof.poks) == 1

    _OuterCommit.ivk = ivk
    w = proof_witness_bn254(proof)
    good = _OuterCommit(inner_y=36)
    good.proof_limbs = w
    assert is_solved(good, F)
    # tampered commitment point -> the PoK / hash chain must fail
    w2 = list(w)
    w2[8 * emu.K] = (w2[8 * emu.K] + 1) % (1 << emu.B)
    bad = _OuterCommit(inner_y=36)
    bad.proof_limbs = w2
    assert not is_solved(bad, F)
