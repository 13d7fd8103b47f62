"""GKR protocol for layered arithmetic circuits (host prover/verifier).

Analog of the reference's internal/gkr engine (gkrcore + per-curve
provers; SURVEY.md §2.3): layers of add/mul gates, one sumcheck per
layer over

    f(u,v) = add~(r,u,v) * (W(u) + W(v)) + mult~(r,u,v) * W(u) * W(v)

with the two resulting W-claims merged by the classic line-restriction
trick. Fiat-Shamir via MiMC. The in-circuit verifier (std/gkrapi
analog) composes this with std.sumcheck gadgets — follow-up; this
module is the protocol core + oracle.

Circuit layout: `layers[i]` is a list of gates ('add'|'mul', l, r)
indexing into layer i+1's values; `layers[-1]` is fed by the inputs.
Layer widths must be powers of two (pad with ('add', 0, 0) dummies).
Variable order convention: x_0 is the MSB of the gate index.
"""

from __future__ import annotations

from gnark_tpu import fields
from gnark_tpu.std.hash.mimc import MiMC

F = fields.BN254_FR
Q = F.modulus


def _k(n: int) -> int:
    assert n & (n - 1) == 0
    return n.bit_length() - 1


def evaluate(layers, inputs):
    """All layer value tables, outputs first: [W_0, ..., W_d=inputs]."""
    vals = [list(inputs)]
    for gates in reversed(layers):
        prev = vals[0]
        vals.insert(0, [
            (prev[l] + prev[r]) % Q if op == "add" else prev[l] * prev[r] % Q
            for (op, l, r) in gates])
    return vals


def _eq(r, bits):
    acc = 1
    for rj, b in zip(r, bits):
        acc = acc * ((rj if b else (1 - rj)) % Q) % Q
    return acc


def _bits(x, k):
    """MSB-first bit list of gate index x."""
    return [(x >> (k - 1 - i)) & 1 for i in range(k)]


def _wiring_eval(gates, k_out, k_in, r, b, c):
    """add~(r,b,c), mult~(r,b,c) — direct sparse-sum evaluation."""
    add_v, mul_v = 0, 0
    for g, (op, l, rr) in enumerate(gates):
        t = _eq(r, _bits(g, k_out)) * _eq(b, _bits(l, k_in)) % Q \
            * _eq(c, _bits(rr, k_in)) % Q
        if op == "add":
            add_v = (add_v + t) % Q
        else:
            mul_v = (mul_v + t) % Q
    return add_v, mul_v


def _fold_t(table, t):
    half = len(table) // 2
    return [(table[i] + t * (table[half + i] - table[i])) % Q
            for i in range(half)]


def mle_eval(table, point):
    t = list(table)
    for r in point:
        t = _fold_t(t, r)
    return t[0]


def _dense_wiring(gates, k_in, r):
    """Dense tables A[u*2^k+v], M[...] of add~(r,u,v), mult~(r,u,v)."""
    k_out = _k(len(gates))
    n = 1 << k_in
    A = [0] * (n * n)
    M = [0] * (n * n)
    for g, (op, l, rr) in enumerate(gates):
        w = _eq(r, _bits(g, k_out))
        idx = l * n + rr
        if op == "add":
            A[idx] = (A[idx] + w) % Q
        else:
            M[idx] = (M[idx] + w) % Q
    return A, M


def _layer_sumcheck_prove(A, M, Wu, Wv, ts: MiMC):
    """Sumcheck for sum A*(Wu+Wv) + M*Wu*Wv over 2k boolean vars.
    Returns (claim, rounds, challenges)."""
    def combine(a, m, wu, wv):
        return (a * (wu + wv) + m * wu * wv) % Q

    claim = sum(combine(a, m, wu, wv)
                for a, m, wu, wv in zip(A, M, Wu, Wv)) % Q
    rounds = []
    chals = []
    tabs = [list(A), list(M), list(Wu), list(Wv)]
    while len(tabs[0]) > 1:
        evals = []
        for t in (0, 1, 2):
            ft = [_fold_t(tb, t) for tb in tabs]
            evals.append(sum(combine(a, m, wu, wv)
                             for a, m, wu, wv in zip(*ft)) % Q)
        rounds.append(tuple(evals))
        ts.write(*evals)
        r = ts.sum()
        chals.append(r)
        tabs = [_fold_t(tb, r) for tb in tabs]
    return claim, rounds, chals


def _interp3(s0, s1, s2, r):
    inv2 = pow(2, -1, Q)
    l0 = (r - 1) * (r - 2) % Q * inv2 % Q
    l1 = (-r) * (r - 2) % Q
    l2 = r * (r - 1) % Q * inv2 % Q
    return (s0 * l0 + s1 * l1 + s2 * l2) % Q


def _poly_eval_points(vals, r):
    """Evaluate the degree-(len(vals)-1) poly through (i, vals[i]) at r."""
    n = len(vals)
    out = 0
    for i, v in enumerate(vals):
        num, den = 1, 1
        for j in range(n):
            if j != i:
                num = num * ((r - j) % Q) % Q
                den = den * ((i - j) % Q) % Q
        out = (out + v * num % Q * pow(den, -1, Q)) % Q
    return out


def prove(layers, inputs):
    """Returns (outputs, proof). proof = per-layer dicts."""
    vals = evaluate(layers, inputs)
    outputs = vals[0]
    ts = MiMC(F.name)
    for o in outputs:
        ts.write(o)
    k0 = _k(len(outputs))
    r = []
    for i in range(k0):                # k0 distinct challenges
        ts.write(i)
        r.append(ts.sum())
    proof = []
    for li, gates in enumerate(layers):
        W_in = vals[li + 1]
        k_in = _k(len(W_in))
        n = 1 << k_in
        A, M = _dense_wiring(gates, k_in, r)
        Wu = [W_in[z // n] for z in range(n * n)]
        Wv = [W_in[z % n] for z in range(n * n)]
        claim, rounds, chals = _layer_sumcheck_prove(A, M, Wu, Wv, ts)
        b, c = chals[:k_in], chals[k_in:]
        wu = mle_eval(W_in, b)
        wv = mle_eval(W_in, c)
        # line restriction q(t) = W~(b + t(c-b)), degree <= k_in,
        # sent as evaluations at t = 0..k_in
        qvals = []
        for t in range(k_in + 1):
            pt = [(bb + t * (cc - bb)) % Q for bb, cc in zip(b, c)]
            qvals.append(mle_eval(W_in, pt))
        ts.write(*qvals)
        rstar = ts.sum()
        ts.write(rstar)
        proof.append(dict(claim=claim, rounds=rounds, q=qvals))
        r = [(bb + rstar * (cc - bb)) % Q for bb, cc in zip(b, c)]
    return outputs, proof


def verify(layers, inputs, outputs, proof) -> bool:
    ts = MiMC(F.name)
    for o in outputs:
        ts.write(o)
    k0 = _k(len(outputs))
    r = []
    for i in range(k0):
        ts.write(i)
        r.append(ts.sum())
    claim = mle_eval(outputs, r)
    for li, gates in enumerate(layers):
        p = proof[li]
        if p["claim"] != claim:
            return False
        k_in = len(p["rounds"]) // 2
        cur = claim
        chals = []
        for (s0, s1, s2) in p["rounds"]:
            if (s0 + s1) % Q != cur:
                return False
            ts.write(s0, s1, s2)
            rc = ts.sum()
            chals.append(rc)
            cur = _interp3(s0, s1, s2, rc)
        b, c = chals[:k_in], chals[k_in:]
        qvals = p["q"]
        wu, wv = qvals[0], qvals[1]    # q(0) = W~(b), q(1) = W~(c)
        add_v, mul_v = _wiring_eval(gates, _k(len(gates)), k_in, r, b, c)
        if (add_v * (wu + wv) + mul_v * wu * wv) % Q != cur:
            return False
        ts.write(*qvals)
        rstar = ts.sum()
        ts.write(rstar)
        claim = _poly_eval_points(qvals, rstar)
        r = [(bb + rstar * (cc - bb)) % Q for bb, cc in zip(b, c)]
    # final: claim must equal the input MLE at r
    return claim == mle_eval(list(inputs), r)
