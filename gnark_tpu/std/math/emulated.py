"""Emulated (foreign-field) arithmetic (reference std/math/emulated).

Non-native field elements are k limbs of b bits (b=64, k=4 covers all
256-bit fields over our >=253-bit native fields). Multiplication and
reduction are checked with the limb-polynomial carry technique the
reference uses (emulated/field_mul.go): for A*B = Q*p + R, the limb
polynomial t(X) = A(X)B(X) - Q(X)p(X) - R(X) vanishes at X = 2^b, which
is enforced positionwise with range-checked carries:

    t_l + c_{l-1} = c_l * 2^b,   |c_l| < 2^aux  (offset-encoded)

Q and R come from hints; limbs are range-checked on creation. v0 keeps
every element reduced (< 2^(b*k)) and canonical results come from the
hints; add/sub use the same machinery with degree-0 quotients.

Parameters provided for secp256k1 (fp/fr), P-256, BN254 fp, BLS12-381
fr (reference emparams package).
"""

from __future__ import annotations

import dataclasses

from gnark_tpu.constraint.hints import register_hint

B = 64                  # bits per limb
K = 4                   # limbs
AUX = 72                # carry magnitude bound (bits)
MASK = (1 << B) - 1


@dataclasses.dataclass(frozen=True)
class EmuParams:
    name: str
    modulus: int

    @property
    def limbs(self):
        return [(self.modulus >> (B * i)) & MASK for i in range(K)]


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
BLS12_381_FR_EMU = EmuParams(
    "bls12_381_fr",
    0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001)


@register_hint("emu_mulmod")
def _emu_mulmod(q, inputs):
    """[k, p_limbs..., a_limbs..., b_limbs...] -> r (K), q (K+1) limbs.
    (The foreign modulus exceeds the native field, so it travels as
    limbs.)"""
    k = inputs[0]
    p = sum(v << (B * i) for i, v in enumerate(inputs[1:1 + k]))
    a = sum(v << (B * i) for i, v in enumerate(inputs[1 + k:1 + 2 * k]))
    b = sum(v << (B * i) for i, v in enumerate(inputs[1 + 2 * k:1 + 3 * k]))
    prod = a * b
    quo, rem = divmod(prod, p)
    return ([(rem >> (B * i)) & MASK for i in range(k)]
            + [(quo >> (B * i)) & MASK for i in range(k + 1)])


@register_hint("emu_invmod")
def _emu_invmod(q, inputs):
    """[k, p_limbs..., a_limbs...] -> a^-1 mod p limbs (K); 0 -> 0."""
    k = inputs[0]
    p = sum(v << (B * i) for i, v in enumerate(inputs[1:1 + k]))
    a = sum(v << (B * i) for i, v in enumerate(inputs[1 + k:1 + 2 * k]))
    inv = pow(a, -1, p) if a % p else 0
    return [(inv >> (B * i)) & MASK for i in range(k)]


@register_hint("emu_addmod")
def _emu_addmod(q, inputs):
    """[k, sign, p_limbs..., a..., b...] -> r limbs (K), quotient.

    sign=0: r = (a+b) mod p; sign=1: r = (a-b) mod p."""
    k = inputs[0]
    sign = inputs[1]
    p = sum(v << (B * i) for i, v in enumerate(inputs[2:2 + k]))
    a = sum(v << (B * i) for i, v in enumerate(inputs[2 + k:2 + 2 * k]))
    b = sum(v << (B * i) for i, v in enumerate(inputs[2 + 2 * k:2 + 3 * k]))
    val = a - b if sign else a + b
    r = val % p
    quo = (val - r) // p   # in {-1, 0, 1} for reduced inputs
    return [(r >> (B * i)) & MASK for i in range(k)] + [quo % q]


class Element:
    """Reduced foreign-field element: K limb variables, each < 2^B."""

    __slots__ = ("limbs",)

    def __init__(self, limbs):
        self.limbs = list(limbs)


class EmulatedField:
    def __init__(self, api, params: EmuParams):
        self.api = api
        self.p = params.modulus
        self.p_limbs = params.limbs
        self.params = params

    # -- construction --------------------------------------------------------

    def from_const(self, v: int) -> Element:
        v %= self.p
        return Element([(v >> (B * i)) & MASK for i in range(K)])

    def from_limb_vars(self, limb_vars) -> Element:
        """Witness limbs: range-check each to B bits."""
        for lv in limb_vars:
            self.api.to_binary(lv, B)
        return Element(list(limb_vars))

    def to_value_mod_native(self, e: Element):
        """Sum of limbs weighted by 2^(B*i) as a NATIVE field value
        (collision-prone across the foreign modulus; for tests/IO)."""
        api = self.api
        acc = 0
        for i, l in enumerate(e.limbs):
            acc = api.add(acc, api.mul(l, (1 << (B * i)) %
                                       api.field()))
        return acc

    # -- carry-chain core -----------------------------------------------------

    def _range_check_carry(self, c):
        """|c| < 2^AUX via offset encoding."""
        self.api.to_binary(self.api.add(c, 1 << AUX), AUX + 2)

    def _assert_poly_zero(self, coeffs):
        """Limb coefficients t_l (possibly signed circuit values) must
        satisfy t(2^B) == 0: t_l + c_{l-1} == c_l * 2^B with bounded
        carries (hinted via exact division)."""
        api = self.api
        carry = 0
        for l, t in enumerate(coeffs[:-1]):
            # c_l = (t_l + carry) / 2^B — solved exactly by the
            # constraint c_l * 2^B == t_l + carry (division is exact
            # when the identity holds; otherwise unsatisfiable given
            # the range checks below)
            num = api.add(t, carry)
            c = api.new_hint("div", 1, num, 1 << B)[0]
            api.assert_is_equal(api.mul(c, 1 << B), num)
            self._range_check_carry(c)
            carry = c
        api.assert_is_equal(api.add(coeffs[-1], carry), 0)

    # -- ops -------------------------------------------------------------------

    def mul(self, a: Element, b: Element) -> Element:
        api = self.api
        outs = api.new_hint("emu_mulmod", 2 * K + 1, K, *self.p_limbs,
                            *a.limbs, *b.limbs)
        r = self.from_limb_vars(outs[:K])
        q_limbs = outs[K:]
        for qv in q_limbs:
            api.to_binary(qv, B)
        # t(X) = A(X)B(X) - Q(X)p(X) - R(X), degree 2K
        deg = 2 * K
        coeffs = [0] * (deg + 1)
        for i in range(K):
            for j in range(K):
                coeffs[i + j] = api.add(coeffs[i + j],
                                        api.mul(a.limbs[i], b.limbs[j]))
        for i in range(K + 1):
            for j in range(K):
                if self.p_limbs[j]:
                    coeffs[i + j] = api.sub(
                        coeffs[i + j],
                        api.mul(q_limbs[i], self.p_limbs[j]))
        for i in range(K):
            coeffs[i] = api.sub(coeffs[i], r.limbs[i])
        self._assert_poly_zero(coeffs)
        return r

    def _addsub(self, a: Element, b: Element, sign: int) -> Element:
        api = self.api
        outs = api.new_hint("emu_addmod", K + 1, K, sign, *self.p_limbs,
                            *a.limbs, *b.limbs)
        r = self.from_limb_vars(outs[:K])
        quo = outs[K]   # must be in {-1, 0, 1}
        api.assert_is_equal(
            api.mul(quo, api.sub(quo, 1), api.add(quo, 1)), 0)
        coeffs = [0] * (K + 1)
        for i in range(K):
            s = api.add(a.limbs[i], b.limbs[i]) if sign == 0 else \
                api.sub(a.limbs[i], b.limbs[i])
            s = api.sub(s, api.mul(quo, self.p_limbs[i]))
            coeffs[i] = api.sub(s, r.limbs[i])
        self._assert_poly_zero(coeffs)
        return r

    def add(self, a: Element, b: Element) -> Element:
        return self._addsub(a, b, 0)

    def sub(self, a: Element, b: Element) -> Element:
        return self._addsub(a, b, 1)

    def inverse(self, a: Element) -> Element:
        """a^-1 mod p (requires a != 0: constrained via a*r == 1)."""
        api = self.api
        outs = api.new_hint("emu_invmod", K, K, *self.p_limbs, *a.limbs)
        r = self.from_limb_vars(outs)
        prod = self.mul(a, r)
        self.assert_is_equal(prod, self.from_const(1))
        return r

    def div(self, a: Element, b: Element) -> Element:
        return self.mul(a, self.inverse(b))

    def is_zero(self, a: Element):
        """1 iff a == 0 (limb-wise; elements are kept reduced)."""
        api = self.api
        acc = 0
        for l in a.limbs:
            acc = api.add(acc, l)
        # limbs are range-checked to B bits; their sum is < 2^(B+2) so
        # sum == 0 <=> every limb == 0
        return api.is_zero(acc)

    def select(self, cond, a: Element, b: Element) -> Element:
        api = self.api
        return Element([api.select(cond, x, y)
                        for x, y in zip(a.limbs, b.limbs)])

    def assert_is_equal(self, a: Element, b: Element) -> None:
        d = self.sub(a, b)
        for l in d.limbs:
            self.api.assert_is_equal(l, 0)
