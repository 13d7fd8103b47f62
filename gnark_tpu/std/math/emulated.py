"""Emulated (foreign-field) arithmetic (reference std/math/emulated).

Non-native field elements are k limbs of B=64 bits (k chosen from the
modulus size). Correctness of every operation is enforced with the
limb-polynomial carry technique the reference uses
(emulated/field_mul.go): for an identity V = Q*p + R, the limb
polynomial t(X) = V(X) - Q(X)p(X) - R(X) vanishes at X = 2^B, which is
enforced positionwise with range-checked carries:

    t_l + c_{l-1} = c_l * 2^B,   |c_l| < 2^aux  (offset-encoded)

v2 — generalized **sum_of_products**: the whole expression

    r = sum_i c_i * a_i * b_i  +  sum_j d_j * x_j  +  const   (mod p)

is certified with ONE hint and ONE carry chain (c_i, d_j small host
integers). This is the lazy/deferred-reduction economics of the
reference (emulated/field_mul.go mulMod + Eval): tower-field formulas
(Fp2/Fp12 multiplication, line evaluations, curve formulas) become a
handful of carry chains instead of one reduction per intermediate
product. Negative terms are handled by a compile-time offset S*p >= 0
added to both sides, so hinted quotients stay non-negative.

Soundness notes:
- every hinted limb is range-checked to B bits on creation;
- elements are *representationally* non-canonical (value < 2^(B*k),
  not < p) exactly like the reference; `assert_is_equal` is modular
  and sound; `is_zero`/`to_bits` go through `reduce_strict`, which
  pins r < p with an integer-comparison witness (reference
  ReduceStrict);
- carry magnitudes satisfy 2^(aux+B+2) < native modulus so the field
  equation c*2^B = t + carry implies the integer identity.

Parameters provided for secp256k1 (fp/fr), P-256, BN254 fp/fr,
BLS12-381 fr (reference emparams package).
"""

from __future__ import annotations

import dataclasses
import functools

from gnark_tpu.constraint.hints import register_hint

B = 64                  # bits per limb
K = 4                   # default limb count (<=256-bit moduli)
MASK = (1 << B) - 1
COEF_OFF = 1 << 32      # hint encoding offset for small signed coeffs
CONST_OFF = 1 << 128    # hint encoding offset for the constant term


@dataclasses.dataclass(frozen=True)
class EmuParams:
    name: str
    modulus: int
    nb_limbs: int = 0    # 0 -> derived from modulus size

    @property
    def k(self) -> int:
        return self.nb_limbs or max(K, -(-self.modulus.bit_length() // B))

    @property
    def limbs(self):
        return [(self.modulus >> (B * i)) & MASK for i in range(self.k)]


SECP256K1_FP = EmuParams(
    "secp256k1_fp",
    0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEFFFFFC2F)
SECP256K1_FR = EmuParams(
    "secp256k1_fr",
    0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141)
P256_FP = EmuParams(
    "p256_fp",
    0xFFFFFFFF00000001000000000000000000000000FFFFFFFFFFFFFFFFFFFFFFFF)
BN254_FP_EMU = EmuParams(
    "bn254_fp",
    21888242871839275222246405745257275088696311157297823662689037894645226208583)
BN254_FR_EMU = EmuParams(
    "bn254_fr",
    21888242871839275222246405745257275088548364400416034343698204186575808495617)
BLS12_381_FR_EMU = EmuParams(
    "bls12_381_fr",
    0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001)
BLS12_381_FP_EMU = EmuParams(
    "bls12_381_fp",
    0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAAAB)
BLS12_377_FR_EMU = EmuParams(
    "bls12_377_fr",
    8444461749428370424248824938781546531375899335154063827935233455917409239041)
BW6_761_FP_EMU = EmuParams(
    "bw6_761_fp",
    6891450384315732539396789682275657542479668912536150109513790160209623422243491736087683183289411687640864567753786613451161759120554247759349511699125301598951605099378508850372543631423596795951899700429969112842764913119068299)


def _val(limbs, k, off=0):
    return sum(v << (B * i) for i, v in enumerate(limbs[off:off + k]))


@register_hint("emu_sop")
def _emu_sop(q, inputs):
    """Generalized sum-of-products witness.

    inputs: [k, nq, nprod, nlin,
             p (k limbs), S (nq limbs), const+CONST_OFF,
             nprod x (coef+COEF_OFF, a k limbs, b k limbs),
             nlin  x (coef+COEF_OFF, x k limbs)]
    outputs: r (k limbs), q' = (v - r)/p + S (nq limbs)
    """
    k, nq, nprod, nlin = inputs[0], inputs[1], inputs[2], inputs[3]
    i = 4
    p = _val(inputs, k, i); i += k
    S = _val(inputs, nq, i); i += nq
    const = inputs[i] - CONST_OFF; i += 1
    v = const
    for _ in range(nprod):
        c = inputs[i] - COEF_OFF; i += 1
        a = _val(inputs, k, i); i += k
        b = _val(inputs, k, i); i += k
        v += c * a * b
    for _ in range(nlin):
        c = inputs[i] - COEF_OFF; i += 1
        x = _val(inputs, k, i); i += k
        v += c * x
    r = v % p
    qp = (v - r) // p + S
    assert qp >= 0, "emu_sop: offset S too small"
    return ([(r >> (B * i)) & MASK for i in range(k)]
            + [(qp >> (B * i)) & MASK for i in range(nq)])


@register_hint("emu_invmod")
def _emu_invmod(q, inputs):
    """[k, p_limbs..., a_limbs...] -> a^-1 mod p limbs (k); 0 -> 0."""
    k = inputs[0]
    p = _val(inputs, k, 1)
    a = _val(inputs, k, 1 + k) % p
    inv = pow(a, -1, p) if a else 0
    return [(inv >> (B * i)) & MASK for i in range(k)]


@register_hint("emu_gap")
def _emu_gap(q, inputs):
    """[k, p_limbs..., r_limbs...] -> limbs of p - 1 - r (0 if r >= p).

    Witness for reduce_strict's r < p integer comparison."""
    k = inputs[0]
    p = _val(inputs, k, 1)
    r = _val(inputs, k, 1 + k)
    z = max(p - 1 - r, 0)
    return [(z >> (B * i)) & MASK for i in range(k)]


@register_hint("emu_divmod")
def _emu_divmod(q, inputs):
    """[k, p_limbs..., a..., b...] -> a/b mod p limbs (k); x/0 -> 0."""
    k = inputs[0]
    p = _val(inputs, k, 1)
    a = _val(inputs, k, 1 + k) % p
    b = _val(inputs, k, 1 + 2 * k) % p
    r = a * pow(b, -1, p) % p if b else 0
    return [(r >> (B * i)) & MASK for i in range(k)]


@register_hint("emu_varmod_mul")
def _emu_varmod_mul(q, inputs):
    """[k, m_limbs..., a..., b...] -> r = a*b mod m (k limbs) and
    quotient (k+1 limbs); m == 0 -> r = q' = 0."""
    k = inputs[0]
    m = _val(inputs, k, 1)
    a = _val(inputs, k, 1 + k)
    b = _val(inputs, k, 1 + 2 * k)
    if m == 0:
        r, qp = 0, 0
    else:
        r = a * b % m
        qp = (a * b - r) // m
    # quotient needs up to 2k limbs (m as small as 1)
    return ([(r >> (B * i)) & MASK for i in range(k)]
            + [(qp >> (B * i)) & MASK for i in range(2 * k)])


@register_hint("emu_varmod_gap")
def _emu_varmod_gap(q, inputs):
    """[k, m..., r...] -> limbs of m - 1 - r (0 if r >= m)."""
    k = inputs[0]
    m = _val(inputs, k, 1)
    r = _val(inputs, k, 1 + k)
    z = max(m - 1 - r, 0)
    return [(z >> (B * i)) & MASK for i in range(k)]


class VarModField:
    """Arithmetic modulo a VARIABLE k-limb modulus (reference
    std/math/emulated variable-modulus ops, used by the MODEXP
    precompile). Every operand/modulus limb must already be
    range-checked to B bits (from_limb_vars does that)."""

    def __init__(self, api, k: int, m_limbs):
        self.api = api
        self.k = k
        # piggyback on a throwaway field object for rc + carry chains
        self._h = EmulatedField.__new__(EmulatedField)
        self._h.api = api
        self._h.k = k
        from gnark_tpu.std import rangecheck
        self._h._rc = rangecheck.checker(api).check
        self.m = self._h.from_limb_vars(m_limbs)

    def from_limb_vars(self, limbs):
        return self._h.from_limb_vars(limbs)

    def mul(self, a: "Element", b: "Element") -> "Element":
        """a*b mod m: hinted r, q' with a*b - q'*m - r == 0 as integers
        (carry chain over variable-modulus products) and r < m."""
        api, k, h = self.api, self.k, self._h
        outs = api.new_hint("emu_varmod_mul", 3 * k, k,
                            *self.m.limbs, *a.limbs, *b.limbs)
        r = h.from_limb_vars(outs[:k])
        q_limbs = outs[k:]
        for qv in q_limbs:
            h._rc(qv, B)
        coeffs = [0] * (3 * k)
        for i in range(k):
            for j in range(k):
                coeffs[i + j] = api.add(
                    coeffs[i + j], api.mul(a.limbs[i], b.limbs[j]))
        for i in range(2 * k):
            for j in range(k):
                coeffs[i + j] = api.sub(
                    coeffs[i + j], api.mul(q_limbs[i], self.m.limbs[j]))
        for i in range(k):
            coeffs[i] = api.sub(coeffs[i], r.limbs[i])
        tmax = (3 * k + 2) << (2 * B)
        aux = tmax.bit_length() - B + 1
        h._assert_poly_zero(coeffs, aux)
        self._assert_lt_m(r)
        return r

    def _assert_lt_m(self, r: "Element"):
        """r < m via gap witness: r + z + 1 == m as integers."""
        api, k, h = self.api, self.k, self._h
        outs = api.new_hint("emu_varmod_gap", k, k,
                            *self.m.limbs, *r.limbs)
        z = h.from_limb_vars(outs)
        coeffs = []
        for i in range(k):
            c = api.add(r.limbs[i], z.limbs[i])
            if i == 0:
                c = api.add(c, 1)
            coeffs.append(api.sub(c, self.m.limbs[i]))
        h._assert_poly_zero(coeffs, 3)

    def select(self, cond, a: "Element", b: "Element") -> "Element":
        api = self.api
        return Element([api.select(cond, x, y)
                        for x, y in zip(a.limbs, b.limbs)])


class Element:
    """Foreign-field element: k limb variables, each < 2^(B+overflow).

    `overflow` tracks lazy (unreduced) limb growth, the reference's
    Element.overflow (std/math/emulated/element.go): add/sub/neg are
    limb-wise LINEAR ops that cost zero R1CS constraints and bump the
    overflow; only multiplicative ops (sum_of_products and friends)
    emit a carry chain, with bounds widened by the operand overflows."""

    __slots__ = ("limbs", "overflow")

    def __init__(self, limbs, overflow: int = 0):
        self.limbs = list(limbs)
        self.overflow = overflow


class EmulatedField:
    def __init__(self, api, params: EmuParams, use_table_rc: bool = True):
        self.api = api
        self.p = params.modulus
        self.k = params.k
        self.p_limbs = params.limbs
        self.params = params
        if use_table_rc:
            from gnark_tpu.std import rangecheck
            self._rc = rangecheck.checker(api).check
        else:
            self._rc = lambda v, n: api.to_binary(v, n) and None
        self.zero = self.from_const(0)
        self.one = self.from_const(1)

    # -- construction ---------------------------------------------------------

    def from_const(self, v: int) -> Element:
        v %= self.p
        return Element([(v >> (B * i)) & MASK for i in range(self.k)])

    def from_limb_vars(self, limb_vars) -> Element:
        """Witness limbs: range-check each to B bits."""
        for lv in limb_vars:
            if not isinstance(lv, int):
                self._rc(lv, B)
            else:
                assert 0 <= lv < (1 << B)
        return Element(list(limb_vars))

    def to_value_mod_native(self, e: Element):
        """Sum of limbs weighted by 2^(B*i) as a NATIVE field value
        (collision-prone across the foreign modulus; for tests/IO)."""
        api = self.api
        acc = 0
        for i, l in enumerate(e.limbs):
            acc = api.add(acc, api.mul(l, (1 << (B * i)) % api.field()))
        return acc

    # -- carry-chain core -----------------------------------------------------

    def _range_check_carry(self, c, aux):
        """|c| < 2^aux via offset encoding."""
        self._rc(self.api.add(c, 1 << aux), aux + 2)

    def _assert_poly_zero(self, coeffs, aux):
        """Limb coefficients t_l (possibly signed circuit values) must
        satisfy t(2^B) == 0: t_l + c_{l-1} == c_l * 2^B with carries
        range-checked to 2^aux (hinted via exact field division; the
        range check is what pins the integer identity)."""
        api = self.api
        assert aux + B + 3 < api.field().bit_length(), \
            "carry chain would wrap the native field"
        carry = 0
        for t in coeffs[:-1]:
            num = api.add(t, carry)
            c = api.new_hint("div", 1, num, 1 << B)[0]
            api.assert_is_equal(api.mul(c, 1 << B), num)
            self._range_check_carry(c, aux)
            carry = c
        api.assert_is_equal(api.add(coeffs[-1], carry), 0)

    # -- the workhorse --------------------------------------------------------

    def sum_of_products(self, prods=(), lins=(), const: int = 0) -> Element:
        """r = sum c_i*a_i*b_i + sum d_j*x_j + const (mod p), certified
        with one hint + one carry chain.

        prods: iterable of (c:int, a:Element, b:Element)
        lins:  iterable of (d:int, x:Element)
        Coefficients must satisfy |c| < 2^31; |const| < 2^127.
        """
        api, k, p = self.api, self.k, self.p
        prods = list(prods)
        lins = list(lins)
        assert all(abs(c) < COEF_OFF // 2 for c, _, _ in prods)
        assert all(abs(d) < COEF_OFF // 2 for d, _ in lins)
        assert abs(const) < CONST_OFF // 2

        def vmax(e):
            # value bound 2^(B*k + overflow + 1) (lazy limbs, see
            # Element.overflow)
            return 1 << (B * k + e.overflow + 1)

        maxneg = (sum(-c * vmax(a) * vmax(b)
                      for c, a, b in prods if c < 0)
                  + sum(-d * vmax(x) for d, x in lins if d < 0)
                  + max(-const, 0))
        maxpos = (sum(c * vmax(a) * vmax(b)
                      for c, a, b in prods if c > 0)
                  + sum(d * vmax(x) for d, x in lins if d > 0)
                  + max(const, 0))
        S = -(-maxneg // p)              # ceil: v + S*p >= 0 always
        qmax = (maxpos + S * p) // p
        nq = max(1, -(-qmax.bit_length() // B))
        C = S * p + const                # >= 0 compile-time constant
        nc = max(1, -(-C.bit_length() // B))

        s_limbs = [(S >> (B * i)) & MASK for i in range(nq)]
        assert _val(s_limbs, nq) == S, "offset S exceeds quotient width"
        flat = []
        for c, a, b in prods:
            flat += [c + COEF_OFF] + a.limbs + b.limbs
        for d, x in lins:
            flat += [d + COEF_OFF] + x.limbs

        outs = api.new_hint(
            "emu_sop", k + nq, k, nq, len(prods), len(lins),
            *self.p_limbs, *s_limbs, const + CONST_OFF, *flat)
        r = self.from_limb_vars(outs[:k])
        q_limbs = outs[k:]
        for qv in q_limbs:
            self._rc(qv, B)

        ncoef = max(2 * k - 1 if prods else k, nq + k, nc)
        coeffs = [0] * ncoef
        qn = api.field()
        for c, a, b in prods:
            cf = c % qn
            for i in range(k):
                for j in range(k):
                    coeffs[i + j] = api.add(
                        coeffs[i + j],
                        api.mul(api.mul(a.limbs[i], b.limbs[j]), cf))
        for d, x in lins:
            df = d % qn
            for i in range(k):
                coeffs[i] = api.add(coeffs[i], api.mul(x.limbs[i], df))
        for i in range(nc):
            cl = (C >> (B * i)) & MASK
            if cl:
                coeffs[i] = api.add(coeffs[i], cl)
        for i in range(nq):
            for j in range(k):
                if self.p_limbs[j]:
                    coeffs[i + j] = api.sub(
                        coeffs[i + j],
                        api.mul(q_limbs[i], self.p_limbs[j]))
        for i in range(k):
            coeffs[i] = api.sub(coeffs[i], r.limbs[i])

        tmax = (sum(abs(c) * k
                    << (2 * B + a.overflow + b.overflow)
                    for c, a, b in prods)
                + (k << (2 * B))                       # q*p rows
                + sum(abs(d) << (B + x.overflow) for d, x in lins)
                + (2 << B) + (1 << B))
        aux = max(tmax.bit_length() - B + 1, 2)
        self._assert_poly_zero(coeffs, aux)
        return r

    # -- ops ------------------------------------------------------------------

    # -- lazy (no-reduce) ops: zero constraints, overflow-tracked ------------
    #
    # Reference analog: emulated add/sub/neg are limb-wise linear ops
    # that never emit a reduction (std/math/emulated/field_ops.go);
    # only multiplicative chains pay. OV_CAP guards limb growth so
    # the carry-chain aux bound stays well under the native field.

    OV_CAP = 40

    def _capped(self, e: Element) -> Element:
        return self.reduce(e) if e.overflow > self.OV_CAP else e

    def add_nr(self, a: Element, b: Element) -> Element:
        """a + b with NO constraints (lazy limbs)."""
        a, b = self._capped(a), self._capped(b)
        api = self.api
        return Element([api.add(x, y) for x, y in zip(a.limbs, b.limbs)],
                       max(a.overflow, b.overflow) + 1)

    @functools.lru_cache(maxsize=None)
    def _sub_pad(self, ob: int):
        """Constant limb vector with each pad_i >= 2^(B+ob) and value
        ≡ 0 mod p (the reference's subPadding) so lazy subtraction
        limbs never go negative."""
        g = 1 << (B + ob)
        G = sum(g << (B * i) for i in range(self.k))
        delta = (-G) % self.p
        return tuple(g + ((delta >> (B * i)) & MASK)
                     for i in range(self.k))

    def sub_nr(self, a: Element, b: Element) -> Element:
        """a - b with NO constraints (lazy limbs, padded)."""
        a, b = self._capped(a), self._capped(b)
        api = self.api
        pad = self._sub_pad(b.overflow)
        limbs = [api.sub(api.add(x, pi), y)
                 for x, y, pi in zip(a.limbs, b.limbs, pad)]
        return Element(limbs, max(a.overflow, b.overflow + 1) + 1)

    def neg_nr(self, a: Element) -> Element:
        return self.sub_nr(self.zero, a)

    def mul_const_nr(self, a: Element, c: int) -> Element:
        """c * a with NO constraints (c a small positive int)."""
        assert c > 0
        a = self._capped(a)
        api = self.api
        return Element([api.mul(x, c) for x in a.limbs],
                       a.overflow + c.bit_length())

    def div_unchecked(self, a: Element, b: Element) -> Element:
        """a/b certified only by b*r == a — UNSOUND when a == b == 0
        (r unconstrained); callers must guarantee b != 0, exactly the
        reference's emulated Div contract used by the incomplete
        curve formulas (sw_emulated point.go)."""
        api = self.api
        outs = api.new_hint("emu_divmod", self.k, self.k,
                            *self.p_limbs, *a.limbs, *b.limbs)
        r = self.from_limb_vars(outs)
        d = self.sum_of_products([(1, b, r)], lins=[(-1, a)])
        for l in d.limbs:
            api.assert_is_equal(l, 0)
        return r

    def mul(self, a: Element, b: Element) -> Element:
        return self.sum_of_products([(1, a, b)])

    def sqr(self, a: Element) -> Element:
        return self.sum_of_products([(1, a, a)])

    def add(self, a: Element, b: Element) -> Element:
        return self.sum_of_products(lins=[(1, a), (1, b)])

    def sub(self, a: Element, b: Element) -> Element:
        return self.sum_of_products(lins=[(1, a), (-1, b)])

    def neg(self, a: Element) -> Element:
        return self.sum_of_products(lins=[(-1, a)])

    def mul_const(self, a: Element, c: int) -> Element:
        return self.sum_of_products(lins=[(c, a)])

    def reduce(self, a: Element) -> Element:
        """Re-reduce (value unchanged mod p, hinted representative)."""
        return self.sum_of_products(lins=[(1, a)])

    def reduce_strict(self, a: Element) -> Element:
        """r == a (mod p) with r < p *enforced*: witness z >= 0
        (range-checked limbs) with r + z = p - 1 as integers, pinned by
        one carry chain. Reference: emulated ReduceStrict."""
        api = self.api
        r = self.reduce(a)
        outs = api.new_hint("emu_gap", self.k, self.k,
                            *self.p_limbs, *r.limbs)
        z = self.from_limb_vars(outs)
        pm1 = self.p - 1
        coeffs = []
        for i in range(self.k):
            c = api.add(r.limbs[i], z.limbs[i])
            coeffs.append(api.sub(c, (pm1 >> (B * i)) & MASK))
        self._assert_poly_zero(coeffs, 2)
        return r

    def inverse(self, a: Element) -> Element:
        """a^-1 mod p (requires a != 0: constrained via a*r == 1)."""
        api = self.api
        outs = api.new_hint("emu_invmod", self.k, self.k,
                            *self.p_limbs, *a.limbs)
        r = self.from_limb_vars(outs)
        d = self.sum_of_products([(1, a, r)], const=-1)
        for l in d.limbs:
            api.assert_is_equal(l, 0)
        return r

    def div(self, a: Element, b: Element) -> Element:
        """a/b mod p (requires b != 0: constrained via b*r == a)."""
        api = self.api
        outs = api.new_hint("emu_divmod", self.k, self.k,
                            *self.p_limbs, *a.limbs, *b.limbs)
        r = self.from_limb_vars(outs)
        d = self.sum_of_products([(1, b, r)], lins=[(-1, a)])
        for l in d.limbs:
            api.assert_is_equal(l, 0)
        # b == 0 must be rejected even when a == 0 (hint gives 0/0=0):
        inv_b = self.inverse(b)
        del inv_b
        return r

    def is_zero(self, a: Element):
        """1 iff a == 0 (mod p) — strict-reduced first so the
        non-canonical representative p does not fool the check."""
        api = self.api
        r = self.reduce_strict(a)
        acc = 0
        for l in r.limbs:
            acc = api.add(acc, l)
        # limbs are range-checked to B bits; k*2^B << native modulus so
        # sum == 0 <=> every limb == 0
        return api.is_zero(acc)

    def select(self, cond, a: Element, b: Element) -> Element:
        api = self.api
        return Element([api.select(cond, x, y)
                        for x, y in zip(a.limbs, b.limbs)],
                       max(a.overflow, b.overflow))

    def assert_is_equal(self, a: Element, b: Element) -> None:
        d = self.sum_of_products(lins=[(1, a), (-1, b)])
        for l in d.limbs:
            self.api.assert_is_equal(l, 0)
