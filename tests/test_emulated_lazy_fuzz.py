"""Adversarial/randomized differential fuzz of the round-5 lazy
emulated arithmetic (overflow-tracked add_nr/sub_nr/neg_nr +
bound-widened sum_of_products carry chains): random expression DAGs
over lazy ops executed both in-circuit and over python ints.

The carry-chain aux bound and the quotient width are derived from the
tracked overflows (emulated.py sum_of_products); a bound error shows
up here as either an unsatisfiable honest witness (completeness) or
an accepted wrong result (soundness — checked by the final
assert_is_equal against the host value)."""

import random

import pytest

from gnark_tpu import fields
from gnark_tpu.constraint import solve
from gnark_tpu.frontend import (Circuit, Public, Secret, compile_circuit,
                                witness)
from gnark_tpu.std.math import emulated as emu

F = fields.BN254_FR
PARAMS = emu.SECP256K1_FP
P = PARAMS.modulus


def _limbs(v):
    return [(v >> (emu.B * i)) & emu.MASK for i in range(emu.K)]


def _random_program(rng, n_ops):
    """A random sequence of ops over a growing value stack."""
    prog = []
    depth = 2
    for _ in range(n_ops):
        op = rng.choice(["add_nr", "sub_nr", "neg_nr", "mul", "sop2",
                         "mul_const_nr", "div_unchecked"])
        i = rng.randrange(depth)
        j = rng.randrange(depth)
        prog.append((op, i, j, rng.randrange(1, 9)))
        depth += 1
    return prog


def _run_host(prog, a, b):
    vals = [a, b]
    for op, i, j, c in prog:
        x, y = vals[i], vals[j]
        if op == "add_nr":
            vals.append((x + y) % P)
        elif op == "sub_nr":
            vals.append((x - y) % P)
        elif op == "neg_nr":
            vals.append((-x) % P)
        elif op == "mul":
            vals.append(x * y % P)
        elif op == "sop2":
            vals.append((x * y + y * y) % P)
        elif op == "mul_const_nr":
            vals.append(x * c % P)
        elif op == "div_unchecked":
            d = y if y % P else 1
            vals.append(x * pow(d, -1, P) % P)
    return vals[-1]


def _define(api, limb_vars_a, limb_vars_b, limb_vars_r, prog):
    f = emu.EmulatedField(api, PARAMS)
    vals = [f.from_limb_vars(limb_vars_a), f.from_limb_vars(limb_vars_b)]
    for op, i, j, c in prog:
        x, y = vals[i], vals[j]
        if op == "add_nr":
            vals.append(f.add_nr(x, y))
        elif op == "sub_nr":
            vals.append(f.sub_nr(x, y))
        elif op == "neg_nr":
            vals.append(f.neg_nr(x))
        elif op == "mul":
            vals.append(f.mul(x, y))
        elif op == "sop2":
            vals.append(f.sum_of_products([(1, x, y), (1, y, y)]))
        elif op == "mul_const_nr":
            vals.append(f.mul_const_nr(x, c))
        elif op == "div_unchecked":
            ydn = f.select(f.is_zero(y), f.one, y)
            vals.append(f.div_unchecked(x, ydn))
    f.assert_is_equal(vals[-1], f.from_limb_vars(limb_vars_r))


@pytest.mark.parametrize("seed", [1, 7, 23, 99])
def test_lazy_expression_fuzz(seed):
    rng = random.Random(seed)
    prog = _random_program(rng, 14)

    class C(Circuit):
        a: list[Secret]
        b: list[Secret]
        r: list[Public]

        def __init__(self, **kw):
            for fld in ("a", "b", "r"):
                setattr(self, fld, [None] * emu.K)
            super().__init__(**kw)

        def define(self, api):
            _define(api, self.a, self.b, self.r, prog)

    cs = compile_circuit(C(), F)
    for case in range(3):
        av = rng.choice([rng.randrange(P), 0, P - 1, 1])
        bv = rng.choice([rng.randrange(P), P - 1, 2])
        want = _run_host(prog, av, bv)
        inst = C(a=_limbs(av), b=_limbs(bv), r=_limbs(want))
        pub, sec = witness(inst, cs)
        solve(cs, pub, sec)          # honest witness must satisfy
        # wrong result must NOT satisfy (soundness)
        wrong = C(a=_limbs(av), b=_limbs(bv),
                  r=_limbs((want + 1) % P))
        pub2, sec2 = witness(wrong, cs)
        with pytest.raises(Exception):
            solve(cs, pub2, sec2)
