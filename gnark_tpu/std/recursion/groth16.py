"""In-circuit Groth16 verifier for BLS12-377 proofs inside BW6-761
circuits (the native 2-chain; reference std/recursion/groth16
verifier.go:45-620 — that one is generic over emulated curves, this
one targets the 2-chain where inner Fp == outer Fr so all arithmetic
is native).

The inner VerifyingKey embeds as circuit CONSTANTS (its Miller-loop
pair e(-alpha, beta) folds entirely at compile time); the proof and
public inputs are witness variables. The verification equation

    e(Ar, Bs) * e(ksum, -gamma) * e(Krs, -delta) * e(-alpha, beta) == 1

is asserted with one multi-Miller loop + one final exponentiation
(std/algebra/pairing_bls12377; our pairing is e^3 — a fixed odd power,
equation unchanged).
"""

from __future__ import annotations

from gnark_tpu.ec import host
from gnark_tpu.std.algebra.pairing_bls12377 import PairingCircuit
from gnark_tpu.std.algebra.sw_bls12377 import G1Circuit, G2Circuit


def proof_witness(proof):
    """Flatten a backend.groth16.Proof (bls12_377) into the assignment
    dict fields expected by a circuit using assert_proof."""
    (arx, ary), (krx, kry) = proof.ar, proof.krs
    (bx0, bx1), (by0, by1) = proof.bs
    return dict(ar_x=arx, ar_y=ary, krs_x=krx, krs_y=kry,
                bs_x0=bx0, bs_x1=bx1, bs_y0=by0, bs_y1=by1)


def assert_proof(api, vk, proof_vars, publics):
    """Assert a Groth16 proof verifies against the CONSTANT inner vk.

    vk: backend.groth16.VerifyingKey over bls12_377 (host values).
    proof_vars: dict with ar_x/ar_y, bs_x0/bs_x1/bs_y0/bs_y1,
        krs_x/krs_y circuit variables.
    publics: inner public inputs as circuit variables (excluding the
        constant-one wire).
    """
    assert vk.curve.name == "bls12_377", "2-chain inner must be bls12_377"
    assert not vk.commitment_g2_sigma, \
        "commitment circuits need the pedersen leg (not wired yet)"
    if len(publics) != len(vk.g1_k) - 1:
        raise ValueError(f"want {len(vk.g1_k) - 1} inner publics")

    g1 = G1Circuit(api)
    g2 = G2Circuit(api)
    pc = PairingCircuit(api)

    ar = (proof_vars["ar_x"], proof_vars["ar_y"])
    krs = (proof_vars["krs_x"], proof_vars["krs_y"])
    bs = ((proof_vars["bs_x0"], proof_vars["bs_x1"]),
          (proof_vars["bs_y0"], proof_vars["bs_y1"]))

    # on-curve checks (gnark checks on unmarshal; subgroup checks of
    # witness points are enforced by the pairing equation soundness
    # for G1 and left to the cofactor-clearing TODO for Bs)
    g1.assert_on_curve(ar)
    g1.assert_on_curve(krs)
    g2.assert_on_curve(bs)

    # ksum = K[0] + sum publics[i] * K[i+1]  (variable scalars,
    # constant bases)
    nbits = vk.curve.fr.bits
    ksum = g1.msm_const_bases(vk.g1_k[1:], publics, nbits)
    k0 = vk.g1_k[0]
    if k0 is not host.INF:
        ksum = g1.add_distinct(ksum, k0)

    pairs = [
        (ar, bs),
        (ksum, vk.g2_gamma_neg),
        (krs, vk.g2_delta_neg),
        ((vk.g1_alpha[0], (-vk.g1_alpha[1]) % vk.curve.fp.modulus),
         vk.g2_beta),                      # constant pair: folds
    ]
    pc.assert_pairing_product_is_one(pairs)
