"""In-circuit Pedersen knowledge-proof verification
(reference std/commitments/pedersen/verifier.go).

The BSB22 leg of recursive Groth16: a commitment C and its proof of
knowledge pok satisfy e(pok, G2) == e(C, sigma*G2), checked here as
the product e(-pok, G2) * e(C, sigma*G2) == 1.

Both vk G2 points are constants; C/pok are circuit variables."""

from __future__ import annotations

from gnark_tpu.ec.curves import CURVES


def assert_pok_377(api, commitment, pok, g2_sigma):
    """BLS12-377 Pedersen PoK inside a BW6-761 circuit.
    commitment/pok: (x, y) native variable points; g2_sigma: host
    constant G2 point (vk.commitment_g2_sigma[i])."""
    from gnark_tpu.std.algebra.pairing_bls12377 import PairingCircuit
    from gnark_tpu.std.algebra.sw_bls12377 import G1Circuit
    c = CURVES["bls12_377"]
    g1 = G1Circuit(api)
    pc = PairingCircuit(api)
    g1.assert_on_curve(commitment)
    g1.assert_on_curve(pok)
    neg_pok = (pok[0], api.neg(pok[1]))
    pc.assert_pairing_product_is_one(
        [(neg_pok, tuple(c.g2)), (commitment, g2_sigma)])


def assert_pok_bn254(api, commitment, pok, g2_sigma):
    """Emulated BN254 variant. commitment/pok: emulated G1 points;
    g2_sigma: host constant G2 point."""
    from gnark_tpu.std.algebra.pairing_bn254 import FixedG2, PairingBN254
    c = CURVES["bn254"]
    pr = PairingBN254(api)
    pr.assert_on_g1(commitment)
    pr.assert_on_g1(pok)
    neg_pok = (pok[0], pr.fe.neg(pok[1]))
    pr.pairing_check([(neg_pok, FixedG2(tuple(c.g2))),
                      (commitment, FixedG2(g2_sigma))])
