"""Recursion stack: in-circuit BLS12-377 pairing + Groth16 verifier
(native 2-chain inside BW6-761 circuits).

Layers tested bottom-up:
  1. number-theoretic identities the circuit relies on (BLS parameter,
     hard-part exponent decomposition),
  2. host ate oracle vs host Tate engine (bilinearity),
  3. in-circuit pairing vs host oracle through the test engine,
  4. in-circuit Groth16 AssertProof on a real inner proof
     (reference std/recursion/groth16/verifier.go:45-620).
"""

import random

import pytest

from gnark_tpu import fields
from gnark_tpu.backend import groth16
from gnark_tpu.ec.curves import CURVES
from gnark_tpu.ec.host import ec_mul
from gnark_tpu.frontend import (Circuit, Public, Secret, compile_circuit,
                                witness)
from gnark_tpu.pairing.tate import Pairing
from gnark_tpu.std.algebra.pairing_bls12377 import (BLS_X, PairingCircuit,
                                                    host_ate_pair)
from gnark_tpu.std.recursion.groth16 import assert_proof, proof_witness
from gnark_tpu.test_engine import is_solved

C = CURVES["bls12_377"]
F_OUT = fields.BW6_761_FR        # == bls12_377 fp


def test_bls_parameter_identities():
    p, r, x = C.fp.modulus, C.fr.modulus, BLS_X
    assert r == x ** 4 - x ** 2 + 1
    assert p == (x - 1) ** 2 * r // 3 + x
    # the hard-part chain exponent (pairing_bls12377.final_exp)
    assert (x - 1) ** 2 * (x + p) * (x ** 2 + p ** 2 - 1) + 3 \
        == 3 * (p ** 4 - p ** 2 + 1) // r
    # 3 does not divide the cyclotomic order -> ^3 is injective on GT
    assert (p ** 4 - p ** 2 + 1) % 3 != 0


def test_host_ate_bilinear():
    pe = Pairing(C)
    ext = pe.ext
    P, Q = C.g1, C.g2
    e1 = host_ate_pair(pe, P, Q)
    e2 = host_ate_pair(pe, ec_mul(C.host_fp, P, 2), Q)
    e3 = host_ate_pair(pe, P, ec_mul(C.host_g2_field, Q, 2))
    assert e2 == ext.mul(e1, e1) == e3
    assert e1 != ext.one


class _PairCheck(Circuit):
    px: Secret
    py: Secret
    qx0: Secret
    qx1: Secret
    qy0: Secret
    qy1: Secret

    expected = None              # set per-test (host ext element)

    def define(self, api):
        pc = PairingCircuit(api)
        got = pc.pair((self.px, self.py),
                      ((self.qx0, self.qx1), (self.qy0, self.qy1)))
        pc.ext.assert_eq(got, pc.ext.from_host(type(self).expected))


@pytest.mark.slow
def test_circuit_pairing_matches_host():
    pe = Pairing(C)
    P = ec_mul(C.host_fp, C.g1, 5)
    Q = ec_mul(C.host_g2_field, C.g2, 7)
    e = host_ate_pair(pe, P, Q)
    _PairCheck.expected = pe.ext.mul(pe.ext.mul(e, e), e)  # ours = e^3
    good = _PairCheck(px=P[0], py=P[1], qx0=Q[0][0], qx1=Q[0][1],
                      qy0=Q[1][0], qy1=Q[1][1])
    assert is_solved(good, F_OUT)
    bad = _PairCheck(px=P[0], py=P[1] + 1, qx0=Q[0][0], qx1=Q[0][1],
                     qy0=Q[1][0], qy1=Q[1][1])
    assert not is_solved(bad, F_OUT)


class _Cubic(Circuit):
    x: Secret
    y: Public

    def define(self, api):
        x3 = api.mul(self.x, self.x, self.x)
        api.assert_is_equal(api.add(x3, self.x, 5), self.y)


@pytest.fixture(scope="module")
def inner_proof():
    ics = compile_circuit(_Cubic(), fields.BLS12_377_FR)
    ipk, ivk = groth16.setup(ics, "bls12_377", rng=random.Random(11))
    pub, sec = witness(_Cubic(x=3, y=35), ics)
    proof = groth16.prove(ics, ipk, pub, sec, rng=random.Random(12))
    assert groth16.verify(proof, ivk, pub)
    return ivk, proof


class _Outer(Circuit):
    ar_x: Secret
    ar_y: Secret
    bs_x0: Secret
    bs_x1: Secret
    bs_y0: Secret
    bs_y1: Secret
    krs_x: Secret
    krs_y: Secret
    inner_y: Public

    ivk = None                   # inner vk constant, set per-test

    def define(self, api):
        pv = {k: getattr(self, k) for k in
              ("ar_x", "ar_y", "bs_x0", "bs_x1", "bs_y0", "bs_y1",
               "krs_x", "krs_y")}
        assert_proof(api, type(self).ivk, pv, [self.inner_y])


@pytest.mark.slow
def test_in_circuit_groth16_verify(inner_proof):
    ivk, proof = inner_proof
    _Outer.ivk = ivk
    w = proof_witness(proof)
    assert is_solved(_Outer(inner_y=35, **w), F_OUT)
    # wrong public input
    assert not is_solved(_Outer(inner_y=36, **w), F_OUT)
    # tampered proof point
    w2 = dict(w)
    w2["ar_y"] = w2["ar_y"] + 1
    assert not is_solved(_Outer(inner_y=35, **w2), F_OUT)


class _CommittedInner(Circuit):
    x: Secret
    y: Public

    def define(self, api):
        c = api.commit(self.x, api.mul(self.x, self.x))
        api.assert_is_equal(api.is_zero(c), 0)
        x3 = api.mul(self.x, self.x, self.x)
        api.assert_is_equal(api.add(x3, self.x, 5), self.y)


class _OuterCm(Circuit):
    ar_x: Secret
    ar_y: Secret
    bs_x0: Secret
    bs_x1: Secret
    bs_y0: Secret
    bs_y1: Secret
    krs_x: Secret
    krs_y: Secret
    cm0_x: Secret
    cm0_y: Secret
    pok0_x: Secret
    pok0_y: Secret
    inner_y: Public

    ivk = None

    def define(self, api):
        pv = {k: getattr(self, k) for k in
              ("ar_x", "ar_y", "bs_x0", "bs_x1", "bs_y0", "bs_y1",
               "krs_x", "krs_y")}
        pv["commitments"] = [(self.cm0_x, self.cm0_y)]
        pv["poks"] = [(self.pok0_x, self.pok0_y)]
        assert_proof(api, type(self).ivk, pv, [self.inner_y])


@pytest.mark.slow
def test_in_circuit_groth16_commitment_circuit():
    """Recursion over a BSB22 commitment circuit: the inner proof is
    made recursion_friendly (MiMC hash-to-field), the outer circuit
    recomputes the commitment wire value and rho-folds the Pedersen
    PoK equations into the pairing product."""
    ics = compile_circuit(_CommittedInner(), fields.BLS12_377_FR)
    ipk, ivk = groth16.setup(ics, "bls12_377", rng=random.Random(61))
    pub, sec = witness(_CommittedInner(x=3, y=35), ics)
    proof = groth16.prove(ics, ipk, pub, sec, rng=random.Random(62),
                          recursion_friendly=True)
    assert groth16.verify(proof, ivk, pub, recursion_friendly=True)
    assert not groth16.verify(proof, ivk, pub)   # cross-mode must fail

    _OuterCm.ivk = ivk
    w = proof_witness(proof)
    assert "cm0_x" in w and "pok0_x" in w
    good = _OuterCm(inner_y=35, **w)
    assert is_solved(good, F_OUT)
    # tampered commitment point
    w2 = dict(w)
    w2["cm0_y"] = w2["cm0_y"] + 1
    assert not is_solved(_OuterCm(inner_y=35, **w2), F_OUT)
    # swapped pok
    w3 = dict(w)
    w3["pok0_x"], w3["pok0_y"] = w["cm0_x"], w["cm0_y"]
    assert not is_solved(_OuterCm(inner_y=35, **w3), F_OUT)


class _OuterCmSep(_OuterCm):
    def define(self, api):
        pv = {k: getattr(self, k) for k in
              ("ar_x", "ar_y", "bs_x0", "bs_x1", "bs_y0", "bs_y1",
               "krs_x", "krs_y")}
        pv["commitments"] = [(self.cm0_x, self.cm0_y)]
        pv["poks"] = [(self.pok0_x, self.pok0_y)]
        assert_proof(api, type(self).ivk, pv, [self.inner_y],
                     separate_pok=True)


@pytest.mark.slow
def test_in_circuit_groth16_commitment_separate_pok():
    """Reference-parity mode: each Pedersen PoK checked in its OWN
    pairing product (std/commitments/pedersen verifier.go
    AssertCommitment) instead of the rho-folded merge."""
    ics = compile_circuit(_CommittedInner(), fields.BLS12_377_FR)
    ipk, ivk = groth16.setup(ics, "bls12_377", rng=random.Random(71))
    pub, sec = witness(_CommittedInner(x=3, y=35), ics)
    proof = groth16.prove(ics, ipk, pub, sec, rng=random.Random(72),
                          recursion_friendly=True)
    _OuterCmSep.ivk = ivk
    w = proof_witness(proof)
    assert is_solved(_OuterCmSep(inner_y=35, **w), F_OUT)
    w2 = dict(w)
    w2["pok0_y"] = w2["pok0_y"] + 1
    assert not is_solved(_OuterCmSep(inner_y=35, **w2), F_OUT)
