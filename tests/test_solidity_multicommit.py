"""Groth16 Solidity export with MULTIPLE BSB22 commitments
(reference backend/groth16/bn254/solidity.go:437-450 N-commitment
handling; we keep per-commitment PoK pairing calls — the evm hash
mode leaves PoKs unfolded). Simulator-executed (no solc)."""

import hashlib
import random

import pytest

from gnark_tpu import fields
from gnark_tpu.backend import groth16, solidity
from gnark_tpu.ec import host
from gnark_tpu.frontend import (Circuit, Public, Secret, compile_circuit,
                                witness)
from gnark_tpu.pairing import get_pairing

pytestmark = pytest.mark.slow


class TwoCommits(Circuit):
    x: Secret
    y: Secret
    out: Public

    def define(self, api):
        c1 = api.commit(self.x)
        c2 = api.commit(self.y)
        api.assert_is_different(c1, 0)
        api.assert_is_different(c2, 0)
        api.assert_is_equal(api.mul(self.x, self.y), self.out)


def test_groth16_two_commitments_contract():
    cs = compile_circuit(TwoCommits(), fields.BN254_FR)
    assert len(cs.commitments) == 2
    rng = random.Random(123)
    pk, vk = groth16.setup(cs, "bn254", rng=rng)
    pub, sec = witness(TwoCommits(x=6, y=7, out=42), cs)
    proof = groth16.prove(cs, pk, pub, sec, rng=rng,
                          recursion_friendly="evm")
    assert groth16.verify(proof, vk, pub, recursion_friendly="evm")

    src = solidity.export_groth16_verifier(vk)
    assert "SIGMA0_X1" in src and "SIGMA1_X1" in src
    assert "uint256[4] calldata cm" in src
    assert src.count("commitment 0 invalid") == 1
    assert src.count("commitment 1 invalid") == 1

    # simulate the contract equations host-side
    curve = vk.curve
    q = curve.fr.modulus
    f1 = curve.host_fp
    pairing = get_pairing("bn254")
    cm_vals = []
    for ci in range(2):
        C = proof.commitments[ci]
        pok = proof.poks[ci]
        chk = pairing.pairing_product([
            (host.ec_neg(f1, pok), tuple(curve.g2)),
            (C, vk.commitment_g2_sigma[ci])])
        assert pairing.ext.eq(chk, pairing.gt_one())
        cm_vals.append(int.from_bytes(hashlib.sha256(
            C[0].to_bytes(32, "big") + C[1].to_bytes(32, "big")
        ).digest(), "big") % q)

    vkx = vk.g1_k[0]
    for v, pt in zip(list(pub) + cm_vals, vk.g1_k[1:]):
        vkx = host.ec_add(f1, vkx, host.ec_mul(f1, pt, v % q))
    for C in proof.commitments:
        vkx = host.ec_add(f1, vkx, C)
    res = pairing.pairing_product([
        (host.ec_neg(f1, proof.ar), proof.bs),
        (vk.g1_alpha, vk.g2_beta),
        (vkx, vk.g2_gamma),
        (proof.krs, vk.g2_delta)])
    assert pairing.ext.eq(res, pairing.gt_one())
