"""In-circuit BLS12-377 tower fields over the NATIVE field.

The 2-chain property (reference std/algebra/native/fields_bls12377):
BLS12-377's base field Fp equals BW6-761's scalar field Fr, so inside
a BW6-761 circuit every BLS12-377 Fp op is a plain api op — no
emulation. The tower mirrors the host pairing engine's representation
(pairing/tate.py): Fp2 = Fp[u]/(u^2 - nr), and Fp12 as the w-graded
algebra Fp2[w]/(w^6 - xi) — one representation shared by the Miller
loop and the final exponentiation.

Elements: Fp2 = (c0, c1) circuit variables; E6 = 6-tuple of Fp2.
Constants (ints / int-pairs) are accepted everywhere and fold into
linear combinations at compile time, so e.g. a pairing between two
constant points costs zero constraints.
"""

from __future__ import annotations

from gnark_tpu.ec.curves import CURVES
from gnark_tpu.ec.host import Fp, Fp2
from gnark_tpu.pairing.tate import Pairing, pow_in


class CF2:
    """In-circuit Fp2 = Fp[u]/(u^2 - nr). Elements are (c0, c1)."""

    def __init__(self, api, nr: int):
        self.api = api
        self.nr = nr
        self.zero = (0, 0)
        self.one = (1, 0)

    def from_const(self, c) -> tuple:
        if isinstance(c, tuple):
            return c
        return (c, 0)

    def add(self, a, b):
        api = self.api
        return (api.add(a[0], b[0]), api.add(a[1], b[1]))

    def sub(self, a, b):
        api = self.api
        return (api.sub(a[0], b[0]), api.sub(a[1], b[1]))

    def neg(self, a):
        api = self.api
        return (api.neg(a[0]), api.neg(a[1]))

    def mul(self, a, b):
        """(a0+a1 u)(b0+b1 u) = a0b0 + nr a1b1 + (a0b1+a1b0) u
        (3-mul Karatsuba)."""
        api = self.api
        t0 = api.mul(a[0], b[0])
        t1 = api.mul(a[1], b[1])
        t2 = api.mul(api.add(a[0], a[1]), api.add(b[0], b[1]))
        c0 = api.add(t0, api.mul(t1, self.nr))
        c1 = api.sub(api.sub(t2, t0), t1)
        return (c0, c1)

    def sqr(self, a):
        return self.mul(a, a)

    def mul_fp(self, a, s):
        """a * s with s a base-field circuit var (or const)."""
        api = self.api
        return (api.mul(a[0], s), api.mul(a[1], s))

    def conj(self, a):
        return (a[0], self.api.neg(a[1]))

    def inv(self, a):
        """1/(a0+a1 u) = (a0 - a1 u)/(a0^2 - nr a1^2); div constrains
        the denominator nonzero."""
        api = self.api
        den = api.sub(api.mul(a[0], a[0]),
                      api.mul(self.nr, api.mul(a[1], a[1])))
        return (api.div(a[0], den), api.neg(api.div(a[1], den)))

    def div(self, a, b):
        return self.mul(a, self.inv(b))

    def select(self, cond, a, b):
        api = self.api
        return (api.select(cond, a[0], b[0]),
                api.select(cond, a[1], b[1]))

    def assert_eq(self, a, b):
        self.api.assert_is_equal(a[0], b[0])
        self.api.assert_is_equal(a[1], b[1])


class CExt6:
    """In-circuit Fq[w]/(w^6 - xi) with Fq = CF2 (so Fp12 total).

    Mirrors the host ExtField (pairing/tate.py) coefficient-wise so
    host values drop straight into circuit constants.
    """

    def __init__(self, api, curve_name: str = "bls12_377"):
        self.api = api
        self.curve = CURVES[curve_name]
        self.host = Pairing(self.curve)          # host oracle + consts
        self.f2 = CF2(api, self.curve.fp2_nr)
        self.xi = self.host.xi                   # Fp2 const (int pair)
        self.zero = tuple(self.f2.zero for _ in range(6))
        self.one = tuple([self.f2.one] + [self.f2.zero] * 5)
        p = self.curve.fp.modulus
        self.p = p
        hf = self.host.fq
        # frobenius coefficient gamma = xi^((p-1)/6) and its powers;
        # p^6-frobenius coefficient delta = xi^((p^6-1)/6)
        gamma = pow_in(hf, self.xi, (p - 1) // 6)
        delta = pow_in(hf, self.xi, (p ** 6 - 1) // 6)
        self.gammas = [pow_in(hf, gamma, i) for i in range(6)]
        self.deltas = [pow_in(hf, delta, i) for i in range(6)]

    def from_host(self, e):
        """Host ExtField element (int pairs) -> circuit constants."""
        return tuple(tuple(c) for c in e)

    def add(self, a, b):
        return tuple(self.f2.add(x, y) for x, y in zip(a, b))

    def mul(self, a, b):
        f2 = self.f2
        t = [f2.zero] * 11
        for i, ai in enumerate(a):
            for j, bj in enumerate(b):
                t[i + j] = f2.add(t[i + j], f2.mul(ai, bj))
        for i in range(10, 5, -1):
            t[i - 6] = f2.add(t[i - 6],
                              f2.mul(t[i], f2.from_const(self.xi)))
        return tuple(t[:6])

    def sqr(self, a):
        return self.mul(a, a)

    def mul_sparse013(self, f, l0, l1, l3):
        """f * (l0 + l1 w + l3 w^3) — the ate line shape (l0 in Fp as
        an Fp2 with zero u-part, l1/l3 in Fp2)."""
        f2 = self.f2
        t = [f2.zero] * 9
        for i, fi in enumerate(f):
            t[i] = f2.add(t[i], f2.mul(fi, l0))
            t[i + 1] = f2.add(t[i + 1], f2.mul(fi, l1))
            t[i + 3] = f2.add(t[i + 3], f2.mul(fi, l3))
        for i in range(8, 5, -1):
            t[i - 6] = f2.add(t[i - 6],
                              f2.mul(t[i], f2.from_const(self.xi)))
        return tuple(t[:6])

    def frob(self, a):
        """a^p: coefficient-wise Fp2 conjugation times gamma^i (the
        gamma^i are constants -> linear, ~free)."""
        f2 = self.f2
        return tuple(
            f2.mul(f2.conj(ai), f2.from_const(self.gammas[i]))
            for i, ai in enumerate(a))

    def frob2(self, a):
        return self.frob(self.frob(a))

    def conj6(self, a):
        """a^(p^6): delta^i coefficient scaling. In the cyclotomic
        subgroup (post easy part) this IS the inverse."""
        f2 = self.f2
        return tuple(
            f2.mul(ai, f2.from_const(self.deltas[i]))
            for i, ai in enumerate(a))

    def inv(self, a):
        """Full inverse via hint + one verifying mul (the reference
        hints inverses the same way; hint fn uses the host Galois-norm
        inversion)."""
        from gnark_tpu.constraint.hints import register_hint, get_hint
        name = f"ext6_inv_{self.curve.name}"
        host = self.host

        def _inv_hint(q, ins):
            e = tuple((ins[2 * i], ins[2 * i + 1]) for i in range(6))
            out = host.ext.inv(e)
            return [v for c in out for v in c]

        try:
            get_hint(name)
        except KeyError:
            register_hint(name)(_inv_hint)
        flat = [v for c in a for v in c]
        outs = self.api.new_hint(name, 12, *flat)
        r = tuple((outs[2 * i], outs[2 * i + 1]) for i in range(6))
        prod = self.mul(a, r)
        self.assert_eq(prod, self.one)
        return r

    def assert_eq(self, a, b):
        for x, y in zip(a, b):
            self.f2.assert_eq(x, y)

    def pow_u_cyclotomic(self, a, u: int):
        """a^u by square-and-multiply (u = the BLS parameter x,
        low hamming weight)."""
        bits = bin(u)[2:]
        r = a
        for bch in bits[1:]:
            r = self.sqr(r)
            if bch == "1":
                r = self.mul(r, a)
        return r
