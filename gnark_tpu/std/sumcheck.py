"""Sumcheck protocol: host prover + host/in-circuit verifiers.

Reference analog: std/recursion/sumcheck (+ the sumcheck core inside
internal/gkr). Instance: claim C = sum over the boolean hypercube of a
product of two multilinear polynomials,

    C = sum_{x in {0,1}^n} f(x) * g(x)

Per round the prover sends the degree-2 univariate s_i (as evaluations
at 0,1,2); the verifier checks s_i(0)+s_i(1) == previous claim, derives
the challenge r_i by Fiat-Shamir (MiMC in-circuit / host MiMC), and
finally checks f(r)*g(r) == s_n(r_n) against oracle evaluations.

Multilinears are dense evaluation tables of length 2^n.
"""

from __future__ import annotations

from gnark_tpu import fields
from gnark_tpu.std.hash.mimc import MiMC, MiMCGadget


def _fold(table, r, q):
    """Fix the first variable to r: t'[y] = (1-r)*t[0,y] + r*t[1,y]."""
    half = len(table) // 2
    return [(table[i] + r * (table[half + i] - table[i])) % q
            for i in range(half)]


def mle_eval(table, point, q):
    t = list(table)
    for r in point:
        t = _fold(t, r, q)
    return t[0]


def prove(f_table, g_table, field=fields.BN254_FR):
    """Returns (claim, rounds) with rounds = [(s(0), s(1), s(2)), ...].
    Fiat-Shamir via host MiMC over (round evals, prev challenge)."""
    q = field.modulus
    f = list(f_table)
    g = list(g_table)
    assert len(f) == len(g) and len(f) & (len(f) - 1) == 0
    claim = sum(a * b for a, b in zip(f, g)) % q
    rounds = []
    h = MiMC(field.name)
    h.write(claim)
    while len(f) > 1:
        half = len(f) // 2
        s0 = sum(f[i] * g[i] for i in range(half)) % q
        s1 = sum(f[half + i] * g[half + i] for i in range(half)) % q
        # s(2): evaluate the linear extensions at 2
        s2 = sum(((2 * f[half + i] - f[i]) * (2 * g[half + i] - g[i]))
                 for i in range(half)) % q
        rounds.append((s0, s1, s2))
        h.write(s0, s1, s2)
        r = h.sum()
        f = _fold(f, r, q)
        g = _fold(g, r, q)
    return claim, rounds


def _interp3(s0, s1, s2, r, q):
    """Evaluate the degree-2 poly through (0,s0),(1,s1),(2,s2) at r."""
    inv2 = pow(2, -1, q)
    # Lagrange: L0 = (r-1)(r-2)/2, L1 = -r(r-2), L2 = r(r-1)/2
    l0 = (r - 1) * (r - 2) % q * inv2 % q
    l1 = (-r) * (r - 2) % q
    l2 = r * (r - 1) % q * inv2 % q
    return (s0 * l0 + s1 * l1 + s2 * l2) % q


def host_verify(claim, rounds, f_table, g_table,
                field=fields.BN254_FR) -> bool:
    q = field.modulus
    h = MiMC(field.name)
    h.write(claim)
    cur = claim
    point = []
    for (s0, s1, s2) in rounds:
        if (s0 + s1) % q != cur:
            return False
        h.write(s0, s1, s2)
        r = h.sum()
        point.append(r)
        cur = _interp3(s0, s1, s2, r, q)
    fe = mle_eval(f_table, point, q)
    ge = mle_eval(g_table, point, q)
    return fe * ge % q == cur


def verify_gadget(api, claim, rounds, f_eval, g_eval):
    """In-circuit verifier.

    claim, round evals: circuit values; f_eval/g_eval: callbacks
    point -> circuit value producing the oracle evaluations at the
    final point (e.g. mle evaluation over witness tables in-circuit).
    Returns the challenge point (for callers binding more structure).
    """
    h = MiMCGadget(api)
    h.write(claim)
    cur = claim
    point = []
    q = api.field()
    inv2 = pow(2, -1, q)
    for (s0, s1, s2) in rounds:
        api.assert_is_equal(api.add(s0, s1), cur)
        h.write(s0, s1, s2)
        r = h.sum()
        point.append(r)
        l0 = api.mul(api.mul(api.sub(r, 1), api.sub(r, 2)), inv2)
        l1 = api.neg(api.mul(r, api.sub(r, 2)))
        l2 = api.mul(api.mul(r, api.sub(r, 1)), inv2)
        cur = api.add(api.mul(s0, l0), api.add(api.mul(s1, l1),
                                               api.mul(s2, l2)))
    api.assert_is_equal(api.mul(f_eval(point), g_eval(point)), cur)
    return point


def mle_eval_gadget(api, table_vars, point):
    """In-circuit multilinear evaluation of a witness table."""
    t = list(table_vars)
    while len(t) > 1:
        r = point[len(point) - (len(t).bit_length() - 1)]
        half = len(t) // 2
        t = [api.add(t[i], api.mul(r, api.sub(t[half + i], t[i])))
             for i in range(half)]
    return t[0]
