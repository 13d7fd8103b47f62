"""In-circuit grumpkin curve ops, NATIVE arithmetic (reference
std/algebra/native/sw_grumpkin): grumpkin's base field IS bn254's
scalar field, so inside a bn254-fr circuit every coordinate op is a
plain api.mul/div — points cost single constraints, not carry chains.

y^2 = x^3 - 17 over fp = bn254_fr, scalar field n = bn254_fp
(the 2-cycle partner of bn254; reference doc.go). Scalar
multiplication uses the GLV endomorphism phi(x, y) = (beta*x, y) =
[lam]P with the base-point-offset trick: G is added to the
accumulator up front and [2^m]G subtracted at the end, which keeps
every loop addition away from the exceptional Acc == ±B cases
(reference g1.go:170-266 scalarMulGLV).

The GLV decomposition s ≡ (-1)^b1 s1 + lam*(-1)^b2 s2 (mod n) is
verified with ONE emulated carry chain over n (the reference's
emulated GrumpkinFr check, hints.go:48-78); the scalar's limb
decomposition is pinned canonical (< r) so the mod-r ambiguity of a
4x64-limb encoding cannot shift s by a multiple of r.
"""

from __future__ import annotations

from gnark_tpu.constraint.hints import register_hint
from gnark_tpu.ec import curves as curves_mod
from gnark_tpu.ec import host
from gnark_tpu.std.math import emulated as emu

CURVE = curves_mod.CURVES["grumpkin"]
P = CURVE.fp.modulus            # base field = bn254 fr
N = CURVE.fr.modulus            # scalar field = bn254 fp
LAM = 0x59E26BCEA0D48BACD4F263F1ACDB5C4F5763473177FFFFFE
BETA = 0xB3C4D79D41A917585BFC41088D8DAAA78B17EA66B99C90DD
NBITS = 129                     # mini-scalar bit bound

GRUMPKIN_FR = emu.EmuParams("grumpkin_fr", N)


@register_hint("grumpkin_glv")
def _grumpkin_glv(q, inputs):
    """[s] -> [neg1, neg2, |s1| (3 limbs), |s2| (3 limbs)] with
    s ≡ (-1)^neg1 |s1| + lam*(-1)^neg2 |s2| (mod n)."""
    from gnark_tpu.std.algebra.sw_emulated import glv_split
    s = inputs[0] % N
    k1, k2 = glv_split(N, LAM, s)
    assert abs(k1) < (1 << NBITS) and abs(k2) < (1 << NBITS)
    out = [1 if k1 < 0 else 0, 1 if k2 < 0 else 0]
    for v in (abs(k1), abs(k2)):
        out += [(v >> (emu.B * i)) & emu.MASK for i in range(3)]
    return out


@register_hint("grumpkin_limbs")
def _grumpkin_limbs(q, inputs):
    """[s] -> 4 little-endian 64-bit limbs of the canonical s."""
    s = inputs[0] % q
    return [(s >> (64 * i)) & emu.MASK for i in range(4)]


class G1:
    """Affine grumpkin point ops over native circuit variables.
    Identity is encoded (0, 0) where completeness is advertised."""

    def __init__(self, api):
        self.api = api

    # -- complete-ish primitives -----------------------------------------

    def neg(self, Q):
        return (Q[0], self.api.sub(0, Q[1]))

    def select(self, cond, A, B):
        api = self.api
        return (api.select(cond, A[0], B[0]),
                api.select(cond, A[1], B[1]))

    def assert_is_equal(self, A, B):
        self.api.assert_is_equal(A[0], B[0])
        self.api.assert_is_equal(A[1], B[1])

    def add_distinct(self, A, B):
        """A + B, requires x_A != x_B (reference g1.go AddAssign)."""
        api = self.api
        lam = api.div_unchecked(api.sub(B[1], A[1]),
                                api.sub(B[0], A[0]))
        x3 = api.sub(api.sub(api.mul(lam, lam), A[0]), B[0])
        y3 = api.sub(api.mul(lam, api.sub(A[0], x3)), A[1])
        return (x3, y3)

    def double(self, A):
        api = self.api
        xx = api.mul(A[0], A[0])
        lam = api.div_unchecked(api.mul(3, xx), api.mul(2, A[1]))
        x3 = api.sub(api.mul(lam, lam), api.mul(2, A[0]))
        y3 = api.sub(api.mul(lam, api.sub(A[0], x3)), A[1])
        return (x3, y3)

    def double_and_add(self, A, B):
        """2A + B via two chords (reference g1.go:326 DoubleAndAdd).
        Incomplete: A != ±B and 2A != -B."""
        api = self.api
        lam1 = api.div_unchecked(api.sub(B[1], A[1]),
                                 api.sub(B[0], A[0]))
        x2 = api.sub(api.sub(api.mul(lam1, lam1), A[0]), B[0])
        t = api.div_unchecked(api.mul(2, A[1]), api.sub(x2, A[0]))
        lam2 = api.sub(0, api.add(lam1, t))
        x3 = api.sub(api.sub(api.mul(lam2, lam2), A[0]), x2)
        y3 = api.sub(api.mul(lam2, api.sub(A[0], x3)), A[1])
        return (x3, y3)

    def add_unified(self, A, B):
        """Complete addition over the (0,0) identity encoding
        (reference g1.go:47 AddUnified)."""
        api = self.api
        a_inf = api.and_(api.is_zero(A[0]), api.is_zero(A[1]))
        b_inf = api.and_(api.is_zero(B[0]), api.is_zero(B[1]))
        same_x = api.is_zero(api.sub(A[0], B[0]))
        same_y = api.is_zero(api.sub(A[1], B[1]))
        is_dbl = api.and_(same_x, same_y)
        is_opp = api.and_(same_x, api.sub(1, same_y))
        den_add = api.select(same_x, 1, api.sub(B[0], A[0]))
        lam_add = api.div_unchecked(api.sub(B[1], A[1]), den_add)
        den_dbl = api.select(api.is_zero(A[1]), 1, api.mul(2, A[1]))
        lam_dbl = api.div_unchecked(api.mul(3, api.mul(A[0], A[0])),
                                    den_dbl)
        lam = api.select(is_dbl, lam_dbl, lam_add)
        x3 = api.sub(api.sub(api.mul(lam, lam), A[0]), B[0])
        y3 = api.sub(api.mul(lam, api.sub(A[0], x3)), A[1])
        x3 = api.select(is_opp, 0, x3)
        y3 = api.select(is_opp, 0, y3)
        x3 = api.select(a_inf, B[0], x3)
        y3 = api.select(a_inf, B[1], y3)
        x3 = api.select(b_inf, api.select(a_inf, 0, A[0]), x3)
        y3 = api.select(b_inf, api.select(a_inf, 0, A[1]), y3)
        return (x3, y3)

    def assert_on_curve(self, A):
        api = self.api
        x3 = api.mul(api.mul(A[0], A[0]), A[0])
        api.assert_is_equal(api.mul(A[1], A[1]),
                            api.add(x3, CURVE.b % P))

    def phi(self, A):
        """(beta*x, y) = [lam]A."""
        return (self.api.mul(A[0], BETA), A[1])

    # -- scalar multiplication -------------------------------------------

    def _decompose(self, s):
        """GLV split of a native scalar, verified mod n with one
        emulated carry chain; returns (bits1, bits2, neg1, neg2)."""
        api = self.api
        fr = emu.EmulatedField(api, GRUMPKIN_FR)

        # canonical limb decomposition of s (pinned < r so a 4x64
        # encoding cannot alias s + k*r)
        limbs = api.new_hint("grumpkin_limbs", 4, s)
        bits = []
        for l in limbs:
            bits.extend(api.to_binary(l, emu.B))
        acc = 0
        for i, l in enumerate(limbs):
            acc = api.add(acc, api.mul(l, pow(2, 64 * i, P)))
        api.assert_is_equal(acc, s)
        _assert_bits_leq(api, bits, P - 1)
        s_emu = fr.from_limb_vars(limbs)

        outs = api.new_hint("grumpkin_glv", 8, s)
        neg1, neg2 = outs[0], outs[1]
        api.assert_is_boolean(neg1)
        api.assert_is_boolean(neg2)
        s1l, s2l = outs[2:5], outs[5:8]
        bits1, bits2 = [], []
        for lset, bset in ((s1l, bits1), (s2l, bits2)):
            for j, l in enumerate(lset):
                bset.extend(api.to_binary(
                    l, NBITS - 2 * emu.B if j == 2 else emu.B))
        s1e = fr.from_limb_vars(list(s1l) + [0])
        s2e = fr.from_limb_vars(list(s2l) + [0])
        e1 = fr.select(neg1, fr.neg(s1e), s1e)
        e2 = fr.select(neg2, fr.neg(s2e), s2e)
        d = fr.sum_of_products([(1, fr.from_const(LAM), e2)],
                               lins=[(1, e1), (-1, s_emu)])
        for l in d.limbs:
            api.assert_is_equal(l, 0)
        return bits1, bits2, neg1, neg2

    def scalar_mul(self, Q, s):
        """[s]Q for a native scalar variable s in [0, r); complete
        over the (0,0) identity and s = 0 (reference scalarMulGLV)."""
        api = self.api
        q_inf = api.and_(api.is_zero(Q[0]), api.is_zero(Q[1]))
        Q = (api.select(q_inf, 1, Q[0]), api.select(q_inf, 1, Q[1]))

        bits1, bits2, neg1, neg2 = self._decompose(s)

        negy = api.sub(0, Q[1])
        Q1 = (Q[0], api.select(neg1, negy, Q[1]))
        Q2 = (api.mul(Q[0], BETA), api.select(neg2, negy, Q[1]))
        negQ1, negQ2 = self.neg(Q1), self.neg(Q2)

        S = self.add_distinct(Q1, Q2)          # B1 = Q1 + Q2
        D = self.add_distinct(Q1, negQ2)       # B3 = Q1 - Q2
        negS, negD = self.neg(S), self.neg(D)

        # offset trick: Acc starts at B1 + G, [2^(m-1)]G subtracted at
        # the end — loop adds can then never hit Acc == ±B
        m = NBITS
        gx, gy = CURVE.g1
        acc = self.add_unified(S, (gx % P, gy % P))
        for i in range(m - 1, 0, -1):
            b1, b2 = bits1[i], bits2[i]
            bx = api.select(api.xor(b1, b2), D[0], S[0])
            by = api.select(b1, api.select(b2, S[1], D[1]),
                            api.select(b2, negD[1], negS[1]))
            acc = self.double_and_add(acc, (bx, by))
        # bit 0: subtract Qi when even
        cor1 = self.add_unified(acc, negQ1)
        acc = self.select(bits1[0], acc, cor1)
        cor2 = self.add_unified(acc, negQ2)
        acc = self.select(bits2[0], acc, cor2)
        # subtract [2^(m-1)]G (constant point)
        h = host.ec_mul(CURVE.host_fp, (gx, gy), 1 << (m - 1))
        acc = self.add_unified(acc, (h[0], (P - h[1]) % P))
        return self.select(q_inf, (0, 0), acc)


def _assert_bits_leq(api, bits, bound: int):
    """AND-chain v <= bound over LSB-first bits (the reference's
    mustBeLessOrEqCst, std/math/bits)."""
    p_acc = 1
    for i in range(len(bits) - 1, -1, -1):
        if (bound >> i) & 1:
            p_acc = api.mul(p_acc, bits[i])
        else:
            api.assert_is_equal(api.mul(p_acc, bits[i]), 0)
