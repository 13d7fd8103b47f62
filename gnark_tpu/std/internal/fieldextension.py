"""In-circuit extension-field arithmetic over SMALL base fields
(reference std/internal/fieldextension: E4 over koalabear/babybear).

Small 31-bit fields are too small for sound Fiat-Shamir challenges;
protocol challenges are drawn from a degree-d extension instead.
Elements are length-d coefficient tuples of circuit variables over
F_p[x]/(x^d - nr).

The nonresidue nr is chosen (and verified at construction) so that
x^d - nr is irreducible: nr must not be a d'-th power residue for any
prime d' | d — for d = 4 it suffices that nr is a non-square and that
-4*nr^... the simple sufficient check nr^((p-1)/2) != 1 and
nr^((p-1)/4)-criteria below cover p = 1 mod 4 fields (both bears).
"""

from __future__ import annotations

from gnark_tpu import fields

# x^4 - nr irreducibility over F_p (p = 1 mod 4): nr a non-square
# suffices for x^2 - nr irreducible; for x^4 - nr we also need nr not
# of the form -4 y^4 — verified exhaustively cheap below via gcd
# order checks at import for the registered params.
EXT_PARAMS = {
    "koalabear": dict(degree=4, nr=3),
    "babybear": dict(degree=4, nr=11),
}


def _is_irreducible_x4(p: int, nr: int) -> bool:
    """x^4 - nr irreducible over F_p iff nr is not a square and not of
    the form -4*t^4 (classical binomial criterion for 4 | p-1)."""
    if pow(nr, (p - 1) // 2, p) == 1:
        return False
    # nr == -4 t^4 <=> (-nr/4) is a 4th power
    c = (-nr) % p * pow(4, -1, p) % p
    if (p - 1) % 4 == 0 and pow(c, (p - 1) // 4, p) == 1:
        # c is a 4th-power residue only if also a square; double-check
        if pow(c, (p - 1) // 2, p) == 1:
            return False
    return True


for _n, _prm in EXT_PARAMS.items():
    _p = fields.FIELDS[_n].modulus
    assert _is_irreducible_x4(_p, _prm["nr"]), (_n, _prm)


class ExtensionField:
    """F_p[x]/(x^d - nr) over circuit variables."""

    def __init__(self, api, field_name: str):
        prm = EXT_PARAMS[field_name]
        self.api = api
        self.d = prm["degree"]
        self.nr = prm["nr"]
        self.zero = tuple(0 for _ in range(self.d))
        self.one = tuple([1] + [0] * (self.d - 1))

    def from_coeffs(self, cs):
        cs = list(cs)
        assert len(cs) <= self.d
        return tuple(cs + [0] * (self.d - len(cs)))

    def add(self, a, b):
        api = self.api
        return tuple(api.add(x, y) for x, y in zip(a, b))

    def sub(self, a, b):
        api = self.api
        return tuple(api.sub(x, y) for x, y in zip(a, b))

    def neg(self, a):
        api = self.api
        return tuple(api.neg(x) for x in a)

    def mul_scalar(self, a, s):
        api = self.api
        return tuple(api.mul(x, s) for x in a)

    def mul(self, a, b):
        api, d = self.api, self.d
        t = [0] * (2 * d - 1)
        for i, ai in enumerate(a):
            for j, bj in enumerate(b):
                t[i + j] = api.add(t[i + j], api.mul(ai, bj))
        for i in range(2 * d - 2, d - 1, -1):
            t[i - d] = api.add(t[i - d], api.mul(t[i], self.nr))
        return tuple(t[:d])

    def sqr(self, a):
        return self.mul(a, a)

    def inv(self, a):
        """Hint + product check (requires a != 0)."""
        api, d = self.api, self.d
        from gnark_tpu.constraint.hints import HINTS, register_hint
        name = f"extinv_d{d}_nr{self.nr}"
        if name not in HINTS:
            d_, nr_ = d, self.nr

            def _inv(q, ins):
                # polynomial inverse via linear algebra / Euclid in
                # F_q[x]/(x^d - nr): use resultant-free approach —
                # extended Euclid on coefficient lists
                def polymod(f):
                    f = list(f)
                    for i in range(len(f) - 1, d_ - 1, -1):
                        if f[i]:
                            f[i - d_] = (f[i - d_] + f[i] * nr_) % q
                            f[i] = 0
                    return [c % q for c in f[:d_]]

                # brute Euclid over polynomials
                def polydivmod(a_, b_):
                    a_ = list(a_)
                    db = max(i for i, c in enumerate(b_) if c)
                    out = [0] * (len(a_))
                    inv_lead = pow(b_[db], -1, q)
                    for i in range(len(a_) - 1, db - 1, -1):
                        if a_[i]:
                            f = a_[i] * inv_lead % q
                            out[i - db] = f
                            for j, c in enumerate(b_[:db + 1]):
                                a_[i - db + j] = (a_[i - db + j]
                                                 - f * c) % q
                    return out, a_

                mod = [(-nr_) % q] + [0] * (d_ - 1) + [1]
                r0, r1 = mod, list(ins[:d_]) + [0]
                s0, s1 = [0] * (d_ + 1), [1] + [0] * d_
                while any(c % q for c in r1[1:]) or True:
                    nz = [i for i, c in enumerate(r1) if c % q]
                    if not nz:
                        return [0] * d_      # not invertible
                    if nz[-1] == 0:
                        break
                    qq, rr = polydivmod(r0, r1)
                    r0, r1 = r1, rr
                    news = list(s0)
                    for i, c in enumerate(qq):
                        if c:
                            for j in range(len(s1) - i):
                                news[i + j] = (news[i + j]
                                               - c * s1[j]) % q
                    s0, s1 = s1, news
                c0inv = pow(r1[0], -1, q)
                return [(c * c0inv) % q for c in s1[:d_]]

            register_hint(name)(_inv)
        outs = api.new_hint(name, d, *a)
        r = tuple(outs)
        prod = self.mul(a, r)
        api.assert_is_equal(prod[0], 1)
        for c in prod[1:]:
            api.assert_is_equal(c, 0)
        return r

    def assert_eq(self, a, b):
        for x, y in zip(a, b):
            self.api.assert_is_equal(x, y)
