"""Twisted Edwards curve over BN254 fr (Baby Jubjub) — host + gadget.

Analog of the reference's std/algebra/native/twistededwards (in-circuit
Edwards arithmetic for EdDSA). Curve: a*x^2 + y^2 = 1 + d*x^2*y^2 with
the Baby Jubjub parameters over the BN254 scalar field; constants are
validated at import (on-curve + subgroup order checks, like
ec/curves_data.py).

Edwards addition is COMPLETE (no branching) — ideal in-circuit:
    x3 = (x1*y2 + y1*x2) / (1 + d*x1*x2*y1*y2)
    y3 = (y1*y2 - a*x1*x2) / (1 - d*x1*x2*y1*y2)
"""

from __future__ import annotations

from gnark_tpu import fields

Q = fields.BN254_FR.modulus
A = 168700
D = 168696
# subgroup order (prime) and cofactor
ORDER = 2736030358979909402780800718157159386076813972158567259200215660948447373041
COFACTOR = 8

# generator of the prime-order subgroup (circom/gnark Baby Jubjub base)
GX = 5299619240641551281634865583518297030282874472190772894086521144482721001553
GY = 16950150798460657717958625567821834550301663161624707787222815936182638968203


def on_curve(p) -> bool:
    x, y = p
    lhs = (A * x * x + y * y) % Q
    rhs = (1 + D * x * x % Q * y * y) % Q
    return lhs == rhs


def add(p1, p2):
    x1, y1 = p1
    x2, y2 = p2
    dxy = D * x1 % Q * x2 % Q * y1 % Q * y2 % Q
    x3 = (x1 * y2 + y1 * x2) % Q * pow((1 + dxy) % Q, -1, Q) % Q
    y3 = (y1 * y2 - A * x1 * x2) % Q * pow((1 - dxy) % Q, -1, Q) % Q
    return (x3, y3)


def scalar_mul(p, k: int):
    r = (0, 1)
    while k:
        if k & 1:
            r = add(r, p)
        p = add(p, p)
        k >>= 1
    return r


GEN = (GX, GY)
assert on_curve(GEN), "baby jubjub generator not on curve"
assert scalar_mul(GEN, ORDER) == (0, 1), "generator order mismatch"


class EdwardsGadget:
    """In-circuit Baby Jubjub ops (complete Edwards formulas)."""

    def __init__(self, api):
        self.api = api

    def assert_on_curve(self, x, y):
        api = self.api
        x2 = api.mul(x, x)
        y2 = api.mul(y, y)
        lhs = api.add(api.mul(A, x2), y2)
        rhs = api.add(1, api.mul(D, x2, y2))
        api.assert_is_equal(lhs, rhs)

    def add(self, p1, p2):
        api = self.api
        x1, y1 = p1
        x2, y2 = p2
        beta = api.mul(x1, y2)
        gamma = api.mul(y1, x2)
        delta = api.mul(y1, y2)
        eps = api.mul(x1, x2)
        tau = api.mul(beta, gamma)     # x1 x2 y1 y2
        num_x = api.add(beta, gamma)
        den_x = api.add(1, api.mul(D, tau))
        num_y = api.sub(delta, api.mul(A, eps))
        den_y = api.sub(1, api.mul(D, tau))
        x3 = api.div(num_x, den_x)
        y3 = api.div(num_y, den_y)
        return (x3, y3)

    def double(self, p):
        return self.add(p, p)

    def select(self, cond, p1, p2):
        api = self.api
        return (api.select(cond, p1[0], p2[0]),
                api.select(cond, p1[1], p2[1]))

    def scalar_mul_bits(self, p, bits):
        """[k]p with k given LSB-first as circuit booleans."""
        acc = None
        cur = p
        for i, b in enumerate(bits):
            if acc is None:
                # initialize with either identity or p via select
                acc = self.select(b, cur, (0, 1))
            else:
                added = self.add(acc, cur)
                acc = self.select(b, added, acc)
            if i + 1 < len(bits):
                cur = self.double(cur)
        return acc if acc is not None else (0, 1)

    def scalar_mul(self, p, scalar, nbits: int = 253):
        bits = self.api.to_binary(scalar, nbits)
        return self.scalar_mul_bits(p, bits)
