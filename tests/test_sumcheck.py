"""Sumcheck: host roundtrip + in-circuit verifier."""

import random

from gnark_tpu import fields
from gnark_tpu.constraint import solve
from gnark_tpu.frontend import Circuit, Public, Secret, compile_circuit, witness
from gnark_tpu.std import sumcheck
from gnark_tpu.test_engine import is_solved

F = fields.BN254_FR
RNG = random.Random(55)
N = 3  # variables; tables of 8


def make_instance():
    q = F.modulus
    f = [RNG.randrange(q) for _ in range(1 << N)]
    g = [RNG.randrange(q) for _ in range(1 << N)]
    claim, rounds = sumcheck.prove(f, g)
    return f, g, claim, rounds


def test_host_roundtrip():
    f, g, claim, rounds = make_instance()
    assert sumcheck.host_verify(claim, rounds, f, g)
    assert not sumcheck.host_verify((claim + 1) % F.modulus, rounds, f, g)
    bad = [(r0, r1, (r2 + 1) % F.modulus) for r0, r1, r2 in rounds]
    assert not sumcheck.host_verify(claim, bad, f, g)


class SumcheckCircuit(Circuit):
    claim: Public
    f: list[Secret]
    g: list[Secret]
    rnds: list[Secret]

    def __init__(self, **kw):
        self.f = [None] * (1 << N)
        self.g = [None] * (1 << N)
        self.rnds = [None] * (3 * N)
        super().__init__(**kw)

    def define(self, api):
        rounds = [(self.rnds[3 * i], self.rnds[3 * i + 1],
                   self.rnds[3 * i + 2]) for i in range(N)]
        sumcheck.verify_gadget(
            api, self.claim, rounds,
            lambda pt: sumcheck.mle_eval_gadget(api, self.f, pt),
            lambda pt: sumcheck.mle_eval_gadget(api, self.g, pt))


def test_circuit_verifier():
    f, g, claim, rounds = make_instance()
    flat = [v for r in rounds for v in r]
    c = SumcheckCircuit(claim=claim)
    c.f, c.g, c.rnds = f, g, flat
    assert is_solved(c, F)
    cs = compile_circuit(SumcheckCircuit(), F)
    pub, sec = witness(c, cs)
    solve(cs, pub, sec)
    # tampered claim fails in-circuit
    bad = SumcheckCircuit(claim=(claim + 1) % F.modulus)
    bad.f, bad.g, bad.rnds = f, g, flat
    assert not is_solved(bad, F)
