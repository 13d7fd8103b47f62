"""In-circuit KZG opening verification (reference
std/commitments/kzg/verifier.go CheckOpeningProof / FoldProof).

The building block of PLONK recursion: assert that a committed
polynomial evaluates to y at z, given a KZG witness W, entirely inside
a circuit.

Verification equation (G2 side constant — SRS elements — so both
Miller-loop arguments use precomputed fixed lines):

    e(C - [y]G1 + [z]W, G2) * e(-W, [tau]G2) == 1

Variants:
- BN254 emulated (KZGVerifierBN254): commitment/proof points are
  emulated-Fp pairs, y/z native Fr variables.
- BLS12-377-in-BW6-761 native 2-chain (KZGVerifier377): all arithmetic
  native (std/algebra/native analog).
"""

from __future__ import annotations

from gnark_tpu.ec.curves import CURVES
from gnark_tpu.std.algebra.pairing_bn254 import FixedG2, PairingBN254
from gnark_tpu.std.algebra.sw_bn254 import G1EmulatedBN254


class KZGVerifierBN254:
    """vk = (g2_gen, g2_tau) host G2 points from the SRS."""

    def __init__(self, api, g2_tau, g2_gen=None):
        self.api = api
        self.pr = PairingBN254(api)
        self.g1 = G1EmulatedBN254(api, self.pr.fe)
        c = CURVES["bn254"]
        self.fixed_gen = FixedG2(g2_gen or tuple(c.g2))
        self.fixed_tau = FixedG2(g2_tau)
        self.g1_gen = tuple(c.g1)
        self.nbits = c.fr.bits

    def check_opening(self, commitment, proof_w, z, y):
        """Assert the opening. commitment/proof_w: emulated G1 points
        (caller validates on-curve); z, y: native Fr variables."""
        g1 = self.g1
        g1.assert_on_curve(commitment)
        g1.assert_on_curve(proof_w)
        # A = C - [y]G1 + [z]W
        yg = g1.msm_const_bases([self.g1_gen], [y], self.nbits)
        zw = g1.scalar_mul_var_base(proof_w, z, self.nbits)
        a = g1.add_distinct(commitment, g1.neg(yg))
        a = g1.add_distinct(a, zw)
        neg_w = g1.neg(proof_w)
        self.pr.pairing_check([(a, self.fixed_gen),
                               (neg_w, self.fixed_tau)])


class KZGVerifier377:
    """Native 2-chain variant: BLS12-377 KZG verified inside a
    BW6-761 circuit (reference std/commitments/kzg with the native
    sw_bls12377 curve ops)."""

    def __init__(self, api, g2_tau):
        from gnark_tpu.std.algebra.pairing_bls12377 import PairingCircuit
        from gnark_tpu.std.algebra.sw_bls12377 import G1Circuit
        self.api = api
        self.pc = PairingCircuit(api)
        self.g1 = G1Circuit(api)
        c = CURVES["bls12_377"]
        self.curve = c
        self.g2_gen = tuple(c.g2)
        self.g2_tau = g2_tau
        self.g1_gen = tuple(c.g1)
        self.nbits = c.fr.bits

    def check_opening(self, commitment, proof_w, z, y):
        api = self.api
        g1 = self.g1
        g1.assert_on_curve(commitment)
        g1.assert_on_curve(proof_w)
        yg = g1.msm_const_bases([self.g1_gen], [y], self.nbits)
        zw = self._scalar_mul_var(proof_w, z)
        a = g1.add_distinct(commitment, g1.neg(yg))
        a = g1.add_distinct(a, zw)
        neg_w = g1.neg(proof_w)
        self.pc.assert_pairing_product_is_one(
            [(a, self.g2_gen), (neg_w, self.g2_tau)])

    def _scalar_mul_var(self, P, s):
        """[s]P, variable base, native scalar (offset-by-P ladder)."""
        api = self.api
        g1 = self.g1
        bits = api.to_binary(s, self.nbits)
        acc = P
        cur = g1.double(P)
        for i, b in enumerate(bits[1:], start=1):
            added = g1.add_distinct(acc, cur)
            acc = g1.select(b, added, acc)
            if i + 1 < self.nbits:
                cur = g1.double(cur)
        negP = g1.neg(P)
        sub1 = g1.add_distinct(acc, negP)
        return g1.select(bits[0], acc, sub1)
