"""gkrapi: data-parallel GKR with in-circuit verification
(reference std/gkrapi + internal/gkr)."""

import random

from gnark_tpu import fields
from gnark_tpu.frontend import Circuit, Public, Secret, compile_circuit, \
    witness
from gnark_tpu.std import gkrapi
from gnark_tpu.std.hash.mimc import mimc_hash
from gnark_tpu.test_engine import is_solved

F = fields.BN254_FR
Q = F.modulus
RNG = random.Random(404)
N = 8


def host_f(x, k):
    """((x+k)^7 * k + x)^7 — the test per-instance function."""
    t = pow((x + k) % Q, 7, Q)
    return pow((t * k + x) % Q, 7, Q)


class GkrCircuit(Circuit):
    xs: list[Secret]
    ks: list[Secret]
    outs: list[Public]

    def __init__(self, **kw):
        self.xs = [None] * N
        self.ks = [None] * N
        self.outs = [None] * N
        super().__init__(**kw)

    def define(self, api):
        g = gkrapi.GkrApi(api, N)
        x = g.import_input(self.xs)
        k = g.import_input(self.ks)
        t = g.named_gate("pow7", g.add(x, k))
        t = g.named_gate("pow7", g.add(g.mul(t, k), x))
        outs = g.solve(t)
        g.verify()
        for o, want in zip(outs, self.outs):
            api.assert_is_equal(o, want)


def test_gkr_end_to_end_engine():
    xs = [RNG.randrange(Q) for _ in range(N)]
    ks = [RNG.randrange(Q) for _ in range(N)]
    wants = [host_f(x, k) for x, k in zip(xs, ks)]
    inst = GkrCircuit()
    inst.xs, inst.ks, inst.outs = xs, ks, wants
    assert is_solved(inst, F)
    bad = GkrCircuit()
    bad.xs, bad.ks = xs, ks
    bad.outs = [wants[0]] + [(w + 1) % Q for w in wants[1:]]
    assert not is_solved(bad, F)


def test_gkr_solver_path():
    """Through the real constraint system + solver (not just engine)."""
    from gnark_tpu.constraint import SolverError, solve
    xs = [RNG.randrange(Q) for _ in range(N)]
    ks = [RNG.randrange(Q) for _ in range(N)]
    wants = [host_f(x, k) for x, k in zip(xs, ks)]
    cs = compile_circuit(GkrCircuit(), F)
    inst = GkrCircuit()
    inst.xs, inst.ks, inst.outs = xs, ks, wants
    pub, sec = witness(inst, cs)
    solve(cs, pub, sec)
    bad = GkrCircuit()
    bad.xs, bad.ks = xs, ks
    bad.outs = [(w + 1) % Q for w in wants]
    pub2, sec2 = witness(bad, cs)
    import pytest
    with pytest.raises(SolverError):
        solve(cs, pub2, sec2)


def test_gkr_mimc():
    """GKR-accelerated MiMC: N hashes verified via one GKR proof
    (reference gkr-mimc)."""
    xs = [RNG.randrange(Q) for _ in range(N)]
    wants = [mimc_hash([x]) for x in xs]

    class MimcGkr(Circuit):
        xs: list[Secret]
        outs: list[Public]

        def __init__(self, **kw):
            self.xs = [None] * N
            self.outs = [None] * N
            super().__init__(**kw)

        def define(self, api):
            g = gkrapi.GkrApi(api, N)
            x = g.import_input(self.xs)
            h = gkrapi.gkr_mimc_one_block(g, x)
            outs = g.solve(h)
            g.verify()
            for o, want in zip(outs, self.outs):
                api.assert_is_equal(o, want)

    inst = MimcGkr()
    inst.xs, inst.outs = xs, wants
    assert is_solved(inst, F)
    bad = MimcGkr()
    bad.xs = xs
    bad.outs = [(w + 1) % Q for w in wants]
    assert not is_solved(bad, F)


def test_gkr_poseidon2():
    """GKR-accelerated Poseidon2: N 2-to-1 hashes via one GKR proof
    (reference gkr-poseidon2); deep DAG with fanout-3 state wires
    exercising the claim aggregation."""
    from gnark_tpu.std.gkrapi import gkr_poseidon2_hash2
    from gnark_tpu.std.hash.poseidon2 import Poseidon2
    h = Poseidon2("bn254_fr")
    n_i = 4
    xs = [RNG.randrange(Q) for _ in range(n_i)]
    ys = [RNG.randrange(Q) for _ in range(n_i)]
    wants = [h.hash([a, b]) for a, b in zip(xs, ys)]

    class C(Circuit):
        xs: list[Secret]
        ys: list[Secret]
        outs: list[Public]

        def __init__(self, **kw):
            self.xs = [None] * n_i
            self.ys = [None] * n_i
            self.outs = [None] * n_i
            super().__init__(**kw)

        def define(self, api):
            g = gkrapi.GkrApi(api, n_i)
            a = g.import_input(self.xs)
            b = g.import_input(self.ys)
            out = gkr_poseidon2_hash2(g, a, b)
            outs = g.solve(out)
            g.verify()
            for o, want in zip(outs, self.outs):
                api.assert_is_equal(o, want)

    inst = C()
    inst.xs, inst.ys, inst.outs = xs, ys, wants
    assert is_solved(inst, F)
    bad = C()
    bad.xs, bad.ys = xs, ys
    bad.outs = [(w + 1) % Q for w in wants]
    assert not is_solved(bad, F)
