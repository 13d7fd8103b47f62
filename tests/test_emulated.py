"""Emulated foreign-field arithmetic: differential vs Python ints."""

import random

import pytest

from gnark_tpu import fields
from gnark_tpu.constraint import SolverError, solve
from gnark_tpu.frontend import Circuit, Public, Secret, compile_circuit, witness
from gnark_tpu.std.math import emulated as emu
from gnark_tpu.test_engine import is_solved

F = fields.BN254_FR
RNG = random.Random(31337)


def make_circuit(params, op):
    class C(Circuit):
        a: list[Secret]
        b: list[Secret]
        r: list[Public]

        def __init__(self, **kw):
            self.a = [None] * emu.K
            self.b = [None] * emu.K
            self.r = [None] * emu.K
            super().__init__(**kw)

        def define(self, api):
            f = emu.EmulatedField(api, params)
            ea = f.from_limb_vars(self.a)
            eb = f.from_limb_vars(self.b)
            got = getattr(f, op)(ea, eb)
            want = f.from_limb_vars(self.r)
            f.assert_is_equal(got, want)
    return C


def limbs(v):
    return [(v >> (emu.B * i)) & emu.MASK for i in range(emu.K)]


HOST_OP = {"add": lambda a, b, p: (a + b) % p,
           "sub": lambda a, b, p: (a - b) % p,
           "mul": lambda a, b, p: (a * b) % p}


@pytest.mark.parametrize("params", [emu.SECP256K1_FP, emu.BN254_FP_EMU,
                                    emu.P256_FP])
@pytest.mark.parametrize("op", ["add", "sub", "mul"])
def test_emulated_ops(params, op):
    p = params.modulus
    C = make_circuit(params, op)
    for _ in range(3):
        a, b = RNG.randrange(p), RNG.randrange(p)
        r = HOST_OP[op](a, b, p)
        inst = C()
        inst.a, inst.b, inst.r = limbs(a), limbs(b), limbs(r)
        assert is_solved(inst, F), (op, params.name)
        bad = C()
        bad.a, bad.b = limbs(a), limbs(b)
        bad.r = limbs((r + 1) % p)
        assert not is_solved(bad, F), (op, params.name)


def test_emulated_solver_path():
    params = emu.SECP256K1_FP
    p = params.modulus
    C = make_circuit(params, "mul")
    a, b = RNG.randrange(p), RNG.randrange(p)
    r = a * b % p
    cs = compile_circuit(C(), F)
    inst = C()
    inst.a, inst.b, inst.r = limbs(a), limbs(b), limbs(r)
    pub, sec = witness(inst, cs)
    solve(cs, pub, sec)
    from gnark_tpu.native import solve_native
    solve_native(cs, pub, sec)
    bad = C()
    bad.a, bad.b, bad.r = limbs(a), limbs(b), limbs((r + 1) % p)
    pub2, sec2 = witness(bad, cs)
    with pytest.raises(SolverError):
        solve(cs, pub2, sec2)


def test_emulated_mul_edge_cases():
    params = emu.SECP256K1_FR
    p = params.modulus
    C = make_circuit(params, "mul")
    for a, b in [(0, 5), (p - 1, p - 1), (1, p - 1)]:
        inst = C()
        inst.a, inst.b, inst.r = limbs(a), limbs(b), limbs(a * b % p)
        assert is_solved(inst, F)
