"""In-circuit BN254 G1 over the EMULATED base field
(reference std/algebra/emulated/sw_bn254 g1.go / sw_emulated generic).

Used by the emulated recursion verifiers (Groth16/KZG over BN254
proofs inside a BN254-scalar circuit). Scalars are NATIVE variables
(inner Fr == outer Fr for self-recursion). Incomplete affine formulas
with a constant offset ladder for the MSM — same caveats as
sw_bls12377.G1Circuit (degenerate inputs make the circuit
unsatisfiable, never wrong)."""

from __future__ import annotations

from gnark_tpu.ec.curves import CURVES
from gnark_tpu.ec.host import INF, ec_add, ec_mul
from gnark_tpu.std.math import emulated as emu

_C = CURVES["bn254"]


class G1EmulatedBN254:
    def __init__(self, api, fe: emu.EmulatedField | None = None):
        self.api = api
        self.fe = fe or emu.EmulatedField(api, emu.BN254_FP_EMU)

    def from_const(self, P):
        fe = self.fe
        return (fe.from_const(P[0]), fe.from_const(P[1]))

    def assert_on_curve(self, P):
        fe = self.fe
        x, y = P
        x2 = fe.sqr(x)
        d = fe.sum_of_products([(1, y, y), (-1, x2, x)], const=-_C.b)
        for l in d.limbs:
            self.api.assert_is_equal(l, 0)

    def neg(self, P):
        return (P[0], self.fe.neg(P[1]))

    def add_distinct(self, P, Q):
        fe = self.fe
        x1, y1 = P
        x2, y2 = Q
        lam = fe.div(fe.sub(y2, y1), fe.sub(x2, x1))
        x3 = fe.sum_of_products([(1, lam, lam)],
                                lins=[(-1, x1), (-1, x2)])
        y3 = fe.sum_of_products([(1, lam, x1), (-1, lam, x3)],
                                lins=[(-1, y1)])
        return (x3, y3)

    def double(self, P):
        fe = self.fe
        x1, y1 = P
        num = fe.sum_of_products([(3, x1, x1)])
        lam = fe.div(num, fe.mul_const(y1, 2))
        x3 = fe.sum_of_products([(1, lam, lam)], lins=[(-2, x1)])
        y3 = fe.sum_of_products([(1, lam, x1), (-1, lam, x3)],
                                lins=[(-1, y1)])
        return (x3, y3)

    def select(self, cond, P, Q):
        fe = self.fe
        return (fe.select(cond, P[0], Q[0]), fe.select(cond, P[1], Q[1]))

    def scalar_mul_var_base(self, P, s, nbits: int):
        """[s]P for a VARIABLE emulated point and native scalar s.
        Offset-by-P double-and-add (sw_emulated.scalar_mul_bits
        pattern): exceptional only for s in {0, 1, r-1} — callers use
        it on challenge-derived scalars where that is negligible (and
        failure mode is unsatisfiability, not a wrong result)."""
        api = self.api
        fe = self.fe
        bits = api.to_binary(s, nbits)
        acc = P
        cur = self.double(P)
        for i, b in enumerate(bits[1:], start=1):
            added = self.add_distinct(acc, cur)
            acc = self.select(b, added, acc)
            if i + 1 < nbits:
                cur = self.double(cur)
        negP = self.neg(P)
        sub1 = self.add_distinct(acc, negP)
        return self.select(bits[0], acc, sub1)

    def msm_const_bases(self, bases, scalars, nbits: int):
        """sum_i scalars[i] * bases[i], constant host bases, variable
        NATIVE scalars (the verifier's vk.K publics MSM). Constant
        offset S dodges infinity; one conditional add per bit, with
        host-precomputed base doublings (sw_bls12377 pattern)."""
        api = self.api
        f1 = _C.host_fp
        S = ec_mul(f1, _C.g1, 0x1d2c3b4a59687f6e)
        acc = self.from_const(S)
        for base, s in zip(bases, scalars):
            if base is INF:
                continue
            bits = api.to_binary(s, nbits)
            T = base
            for b in bits:
                cand = self.add_distinct(acc, self.from_const(T))
                acc = self.select(b, cand, acc)
                T = ec_add(f1, T, T)
        negS = self.from_const((S[0], (-S[1]) % _C.fp.modulus))
        return self.add_distinct(acc, negS)
