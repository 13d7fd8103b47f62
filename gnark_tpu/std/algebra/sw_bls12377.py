"""In-circuit BLS12-377 G1 ops over the native (BW6-761 scalar) field.

Reference counterpart: std/algebra/native/sw_bls12377. Incomplete
affine formulas; divisions pin nonzero denominators so degenerate
inputs fail solving (reject) rather than wrap around.
"""

from __future__ import annotations

from gnark_tpu.ec.curves import CURVES
from gnark_tpu.ec.host import INF, ec_add, ec_mul

_C = CURVES["bls12_377"]


class G1Circuit:
    def __init__(self, api):
        self.api = api

    def assert_on_curve(self, P):
        api = self.api
        x, y = P
        rhs = api.add(api.mul(x, x, x), _C.b)
        api.assert_is_equal(api.mul(y, y), rhs)

    def neg(self, P):
        return (P[0], self.api.neg(P[1]))

    def add_distinct(self, P, Q):
        api = self.api
        lam = api.div(api.sub(Q[1], P[1]), api.sub(Q[0], P[0]))
        x3 = api.sub(api.sub(api.mul(lam, lam), P[0]), Q[0])
        y3 = api.sub(api.mul(lam, api.sub(P[0], x3)), P[1])
        return (x3, y3)

    def double(self, P):
        api = self.api
        lam = api.div(api.mul(3, P[0], P[0]), api.mul(2, P[1]))
        x3 = api.sub(api.mul(lam, lam), api.mul(2, P[0]))
        y3 = api.sub(api.mul(lam, api.sub(P[0], x3)), P[1])
        return (x3, y3)

    def select(self, cond, P, Q):
        api = self.api
        return (api.select(cond, P[0], Q[0]),
                api.select(cond, P[1], Q[1]))

    def scalar_mul_bits(self, P, bits):
        """[k]P for a VARIABLE point, k as LSB-first circuit booleans.
        Offset-by-P ladder (incomplete adds; exceptional only for
        k in {0, 1, order-1} — unsatisfiable, never wrong)."""
        api = self.api
        acc = P
        cur = self.double(P)
        n = len(bits)
        for i, b in enumerate(bits[1:], start=1):
            added = self.add_distinct(acc, cur)
            acc = self.select(b, added, acc)
            if i + 1 < n:
                cur = self.double(cur)
        negP = self.neg(P)
        sub1 = self.add_distinct(acc, negP)
        return self.select(bits[0], acc, sub1)

    def msm_bits(self, pairs):
        """sum_i [k_i]P_i with k_i LSB-first bit lists; P_i may be host
        constant points (doublings precomputed host-side) or circuit
        points (in-circuit doublings). One shared constant offset
        dodges infinity through the whole accumulation."""
        api = self.api
        f1 = _C.host_fp
        S = ec_mul(f1, _C.g1, 0x7e57_0ff5_e7a9_31)
        acc = S
        for P, bits in pairs:
            if P is INF:
                continue
            const = isinstance(P[0], int) and isinstance(P[1], int)
            T = P
            n = len(bits)
            for i, b in enumerate(bits):
                cand = self.add_distinct(acc, T)
                acc = self.select(b, cand, acc)
                if i + 1 < n:
                    T = ec_add(f1, T, T) if const else self.double(T)
        negS = (S[0], (-S[1]) % _C.fp.modulus)
        return self.add_distinct(acc, negS)

    def msm_const_bases(self, bases, scalars, nbits: int):
        """sum_i scalars[i] * bases[i] with CONSTANT host base points
        and variable circuit scalars — the verifier's vk.K * publics
        MSM. Doubles of the bases are precomputed host-side (free);
        per bit one conditional add (reference varScalarMul shape).

        Returns the sum offset-free: an internal constant shift S
        avoids the point at infinity and is subtracted at the end.
        """
        api = self.api
        f1 = _C.host_fp
        # fixed offset: an arbitrary constant point not in the table
        S = ec_mul(f1, _C.g1, 0xdeadbeef12345)
        acc = S
        for base, s in zip(bases, scalars):
            if base is INF:
                continue
            bits = api.to_binary(s, nbits)
            T = base
            for b in bits:
                cand = self.add_distinct(acc, T)
                acc = self.select(b, cand, acc)
                T = ec_add(f1, T, T)     # host: next doubled constant
        negS = (S[0], (-S[1]) % _C.fp.modulus)
        return self.add_distinct(acc, negS)


class G2Circuit:
    """G2 (twisted, Fp2 coords) helpers for proof points."""

    def __init__(self, api):
        from gnark_tpu.std.algebra.fields_bls12377 import CF2
        self.api = api
        self.f2 = CF2(api, _C.fp2_nr)

    def assert_on_curve(self, Q):
        f2 = self.f2
        x, y = Q
        rhs = f2.add(f2.mul(f2.mul(x, x), x),
                     f2.from_const(tuple(_C.b2)))
        f2.assert_eq(f2.mul(y, y), rhs)
