"""In-circuit BLS12-377 ate pairing (native 2-chain: runs inside
BW6-761 circuits, where the circuit field IS BLS12-377's Fp).

Reference counterpart: std/algebra/native/sw_bls12377/pairing.go.
Design differs TPU/Python-side: one w-graded Fp12 representation
(fields_bls12377.CExt6) shared by the Miller loop and final
exponentiation, with the line shape l0 + l1 w + l3 w^3 coming from the
D-twist untwist (x*w^2, y*w^3).

Miller loop: f_{x,Q}(P) with x = 9586122913090633729 (the BLS
parameter, 64-bit loop — validated bilinear/nondegenerate against the
host engine in tests). Point ops are incomplete affine over in-circuit
Fp2; divisions constrain denominators nonzero, so degenerate
(adversarially crafted) intermediate points make solving fail, which
rejects the proof — same caveat as the reference's affine pairing.

Final exponentiation: easy part (p^6-1)(p^2+1) with one hinted Fp12
inverse, then the HHT hard part to the exponent
3*(p^4-p^2+1)/r = (x-1)^2 (x+p)(x^2+p^2-1) + 3 — a valid pairing
check since gcd(3, #cyclotomic subgroup) = 1 (the exponent identity
and chain are pinned numerically in tests/test_recursion.py).
"""

from __future__ import annotations

from gnark_tpu.std.algebra.fields_bls12377 import CExt6

BLS_X = 9586122913090633729       # BLS12-377 parameter (positive)


class PairingCircuit:
    def __init__(self, api):
        self.api = api
        self.ext = CExt6(api, "bls12_377")
        self.f2 = self.ext.f2

    # -- G2 (twisted, Fp2 coords) affine ops ---------------------------

    def _double_step(self, T, P):
        """T <- 2T; returns (T', line(P)) with line = (l0, l1, l3)."""
        f2 = self.f2
        xt, yt = T
        xp, yp = P
        # lam' = 3 xt^2 / (2 yt)
        lam = f2.div(f2.mul_fp(f2.sqr(xt), 3), f2.mul_fp(yt, 2))
        x3 = f2.sub(f2.sqr(lam), f2.mul_fp(xt, 2))
        y3 = f2.sub(f2.mul(lam, f2.sub(xt, x3)), yt)
        l0 = (yp, 0)
        l1 = f2.neg(f2.mul_fp(lam, xp))
        l3 = f2.sub(f2.mul(lam, xt), yt)
        return (x3, y3), (l0, l1, l3)

    def _add_step(self, T, Q, P):
        """T <- T + Q; returns (T', line(P))."""
        f2 = self.f2
        xt, yt = T
        xq, yq = Q
        xp, yp = P
        lam = f2.div(f2.sub(yt, yq), f2.sub(xt, xq))
        x3 = f2.sub(f2.sub(f2.sqr(lam), xt), xq)
        y3 = f2.sub(f2.mul(lam, f2.sub(xt, x3)), yt)
        l0 = (yp, 0)
        l1 = f2.neg(f2.mul_fp(lam, xp))
        l3 = f2.sub(f2.mul(lam, xt), yt)
        return (x3, y3), (l0, l1, l3)

    # -- Miller loop ---------------------------------------------------

    def miller_loop(self, pairs):
        """Multi-Miller: prod_i f_{x,Qi}(Pi), one shared f-squaring per
        loop bit (reference MillerLoop does the same batching)."""
        ext = self.ext
        Ts = [Q for _, Q in pairs]
        f = ext.one
        bits = bin(BLS_X)[3:]      # MSB consumed by T = Q
        for b in bits:
            f = ext.sqr(f)
            for i, (P, Q) in enumerate(pairs):
                Ts[i], (l0, l1, l3) = self._double_step(Ts[i], P)
                f = ext.mul_sparse013(f, l0, l1, l3)
            if b == "1":
                for i, (P, Q) in enumerate(pairs):
                    Ts[i], (l0, l1, l3) = self._add_step(Ts[i], Q, P)
                    f = ext.mul_sparse013(f, l0, l1, l3)
        return f

    # -- final exponentiation ------------------------------------------

    def final_exp(self, f):
        ext = self.ext
        # easy part: f^((p^6-1)(p^2+1))
        inv = ext.inv(f)
        m = ext.mul(ext.conj6(f), inv)             # f^(p^6-1)
        m = ext.mul(ext.frob2(m), m)               # ^(p^2+1)
        # hard part: m^((x-1)^2 (x+p)(x^2+p^2-1)) * m^3
        # (in the cyclotomic subgroup conj6 == inverse)
        x = BLS_X
        a1 = ext.mul(ext.pow_u_cyclotomic(m, x), ext.conj6(m))
        a2 = ext.mul(ext.pow_u_cyclotomic(a1, x), ext.conj6(a1))
        b = ext.mul(ext.pow_u_cyclotomic(a2, x), ext.frob(a2))
        c = ext.pow_u_cyclotomic(ext.pow_u_cyclotomic(b, x), x)
        e = ext.mul(ext.mul(c, ext.frob2(b)), ext.conj6(b))
        m3 = ext.mul(ext.sqr(m), m)
        return ext.mul(e, m3)

    # -- public API ----------------------------------------------------

    def pair(self, P, Q):
        """e(P, Q) as an in-circuit Fp12 element."""
        return self.final_exp(self.miller_loop([(P, Q)]))

    def assert_pairing_product_is_one(self, pairs):
        """Assert prod_i e(Pi, Qi) == 1 (multi-Miller + one final
        exp + equality), the shape every verifier equation uses."""
        f = self.final_exp(self.miller_loop(pairs))
        self.ext.assert_eq(f, self.ext.one)


def g1_neg(api, P):
    return (P[0], api.neg(P[1]))


# ---------------------------------------------------------------------------
# host oracle (same ate formulation over host ints, for tests/vk consts)
# ---------------------------------------------------------------------------

def host_ate_miller(pe, pairs):
    """Host multi-Miller f_{x,Q}(P); pe = pairing.tate.Pairing of
    bls12_377. Same line shape as the circuit version."""
    ext, fq = pe.ext, pe.fq
    Ts = [Q for _, Q in pairs]
    f = ext.one
    bits = bin(BLS_X)[3:]
    for b in bits:
        f = ext.sqr(f)
        for i, (P, Q) in enumerate(pairs):
            xt, yt = Ts[i]
            xp, yp = P
            lam = fq.mul(fq.mul(fq.from_int(3), fq.sqr(xt)),
                         fq.inv(fq.mul(fq.from_int(2), yt)))
            l = list(ext.zero)
            l[0] = fq.from_int(yp)
            l[1] = fq.neg(fq.mul(lam, fq.from_int(xp)))
            l[3] = fq.sub(fq.mul(lam, xt), yt)
            f = ext.mul(f, tuple(l))
            x3 = fq.sub(fq.sqr(lam), fq.mul(fq.from_int(2), xt))
            y3 = fq.sub(fq.mul(lam, fq.sub(xt, x3)), yt)
            Ts[i] = (x3, y3)
        if b == "1":
            for i, (P, Q) in enumerate(pairs):
                xt, yt = Ts[i]
                xq, yq = Q
                xp, yp = P
                lam = fq.mul(fq.sub(yt, yq), fq.inv(fq.sub(xt, xq)))
                l = list(ext.zero)
                l[0] = fq.from_int(yp)
                l[1] = fq.neg(fq.mul(lam, fq.from_int(xp)))
                l[3] = fq.sub(fq.mul(lam, xt), yt)
                f = ext.mul(f, tuple(l))
                x3 = fq.sub(fq.sub(fq.sqr(lam), xt), xq)
                y3 = fq.sub(fq.mul(lam, fq.sub(xt, x3)), yt)
                Ts[i] = (x3, y3)
    return f


def host_ate_pair(pe, P, Q):
    """Full host ate pairing e(P, Q) (Miller + (p^12-1)/r exp)."""
    f = host_ate_miller(pe, [(P, Q)])
    return pe.ext.pow(f, (pe.p ** 12 - 1) // pe.r)
