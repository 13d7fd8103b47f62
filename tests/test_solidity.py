"""Solidity export: structural checks + EVM-semantics simulation.

No solc in the image (the reference gates compilation behind
-tags=solccheck similarly); we simulate the contract's pairing-product
equation host-side instead: e(-A,B)*e(alpha,beta)*e(vkx,gamma)*
e(C,delta) == 1 with the exact points the contract would use.
"""

import random

import pytest

from gnark_tpu import fields
from gnark_tpu.backend import groth16, solidity
from gnark_tpu.ec import curves, host
from gnark_tpu.frontend import compile_circuit, witness
from gnark_tpu.pairing import get_pairing

from tests.test_frontend import Cubic

pytestmark = pytest.mark.slow  # heavy e2e: full tier only


@pytest.fixture(scope="module")
def setup_proof():
    cs = compile_circuit(Cubic(), fields.BN254_FR)
    rng = random.Random(77)
    pk, vk = groth16.setup(cs, "bn254", rng=rng)
    pub, sec = witness(Cubic(x=3, y=35), cs)
    proof = groth16.prove(cs, pk, pub, sec, rng=rng)
    return vk, proof, pub


def test_export_structure(setup_proof):
    vk, proof, pub = setup_proof
    src = solidity.export_groth16_verifier(vk)
    assert "function verifyProof" in src
    assert f"ALPHA_X = {vk.g1_alpha[0]}" in src
    # EIP-197: imaginary part first
    assert f"BETA_X1 = {vk.g2_beta[0][1]}" in src
    assert "staticcall(gas(), 8" in src
    assert "pragma solidity" in src
    cd = solidity.proof_calldata(proof)
    assert len(cd) == 8 and cd[0] == proof.ar[0]


def test_contract_equation_semantics(setup_proof):
    """The pairing equation the contract checks must hold for a valid
    proof and fail for a wrong public input."""
    vk, proof, pub = setup_proof
    curve = curves.CURVES["bn254"]
    f1 = curve.host_fp
    pairing = get_pairing("bn254")

    def contract_checks(public):
        vkx = vk.g1_k[0]
        for v, pt in zip(public, vk.g1_k[1:]):
            vkx = host.ec_add(f1, vkx, host.ec_mul(f1, pt, v))
        neg_a = host.ec_neg(f1, proof.ar)
        res = pairing.pairing_product([
            (neg_a, proof.bs),
            (vk.g1_alpha, vk.g2_beta),
            (vkx, vk.g2_gamma),
            (proof.krs, vk.g2_delta),
        ])
        return pairing.ext.eq(res, pairing.gt_one())

    assert contract_checks(pub)
    assert not contract_checks([36])
