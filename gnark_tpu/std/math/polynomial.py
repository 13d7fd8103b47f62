"""Polynomial evaluation gadgets (reference std/math/polynomial:
univariate + multilinear, used by the recursion/sumcheck verifiers)."""

from __future__ import annotations


def eval_univariate(api, coeffs, x):
    """p(x) by Horner; coeffs low-to-high."""
    acc = 0
    for c in reversed(list(coeffs)):
        acc = api.add(api.mul(acc, x), c)
    return acc


def eval_multilinear(api, values, point):
    """Multilinear extension of `values` (len 2^m, index MSB-first in
    point order) evaluated at `point` — O(n) fold."""
    t = list(values)
    for r in point:
        half = len(t) // 2
        t = [api.add(t[i], api.mul(r, api.sub(t[half + i], t[i])))
             for i in range(half)]
    assert len(t) == 1
    return t[0]


def interpolate_on_range(api, evals, x):
    """Evaluate the degree-(n-1) polynomial through (i, evals[i]),
    i = 0..n-1, at a VARIABLE x (Lagrange with constant denominators;
    prefix/suffix products keep it O(n) muls)."""
    q = api.field()
    n = len(evals)
    diffs = [api.sub(x, j) for j in range(n)]
    pre = [None] * n
    suf = [None] * n
    for i in range(n):
        pre[i] = diffs[i] if i == 0 else api.mul(pre[i - 1], diffs[i])
    for i in range(n - 1, -1, -1):
        suf[i] = diffs[i] if i == n - 1 else api.mul(suf[i + 1], diffs[i])
    out = 0
    for i in range(n):
        num = 1
        if i > 0:
            num = pre[i - 1]
        if i < n - 1:
            num = api.mul(num, suf[i + 1])
        den = 1
        for j in range(n):
            if j != i:
                den = den * ((i - j) % q) % q
        term = api.mul(num, evals[i])
        if den != 1:
            term = api.mul(term, pow(den, -1, q))
        out = api.add(out, term)
    return out
