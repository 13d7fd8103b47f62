"""Randomized differential fuzzing: engine vs Python solver vs native
solver over randomly generated circuits (reference test/assert_fuzz.go
strategy, with the tinyfield trick for cheap enumeration)."""

import random

import pytest

from gnark_tpu import fields
from gnark_tpu.constraint import SolverError, solve
from gnark_tpu.frontend import Circuit, Public, Secret, compile_circuit, witness
from gnark_tpu.native import solve_native, supports
from gnark_tpu.test_engine import is_solved

TINY = fields.TINYFIELD
BN = fields.BN254_FR


def random_program(seed: int, n_ops: int = 12):
    """A random straight-line program over 3 inputs; returns define().

    The RNG is re-seeded inside define so every call (engine, compile)
    builds the IDENTICAL program."""

    def define(self, api):
        rng = random.Random(seed)
        pool = [self.a, self.b, self.c, 1, 2]
        for _ in range(n_ops):
            op = rng.choice(["add", "sub", "mul", "select", "xor_b",
                             "is_zero", "div_u"])
            x, y = rng.choice(pool), rng.choice(pool)
            if op == "add":
                pool.append(api.add(x, y))
            elif op == "sub":
                pool.append(api.sub(x, y))
            elif op == "mul":
                pool.append(api.mul(x, y))
            elif op == "select":
                z = api.is_zero(rng.choice(pool))
                pool.append(api.select(z, x, y))
            elif op == "xor_b":
                bx = api.is_zero(x)
                by = api.is_zero(y)
                pool.append(api.xor(bx, by))
            elif op == "is_zero":
                pool.append(api.is_zero(x))
            elif op == "div_u":
                pool.append(api.div_unchecked(x, y))
        api.assert_is_equal(api.add(pool[-1], pool[-2]), self.out)

    return define


def run_case(seed: int, field, a, b, c):
    define = random_program(seed)
    Circ = type(f"Fuzz{seed}", (Circuit,),
                {"define": define,
                 "__annotations__": {"a": Secret, "b": Secret, "c": Secret,
                                     "out": Public}})

    # compute expected `out` via the engine on a probe circuit
    result = {}

    def probing_define(self, api):
        pool = [self.a, self.b, self.c, 1, 2]
        rng = random.Random(seed)
        for _ in range(12):
            op = rng.choice(["add", "sub", "mul", "select", "xor_b",
                             "is_zero", "div_u"])
            x, y = rng.choice(pool), rng.choice(pool)
            if op == "add":
                pool.append(api.add(x, y))
            elif op == "sub":
                pool.append(api.sub(x, y))
            elif op == "mul":
                pool.append(api.mul(x, y))
            elif op == "select":
                z = api.is_zero(rng.choice(pool))
                pool.append(api.select(z, x, y))
            elif op == "xor_b":
                pool.append(api.xor(api.is_zero(x), api.is_zero(y)))
            elif op == "is_zero":
                pool.append(api.is_zero(x))
            elif op == "div_u":
                pool.append(api.div_unchecked(x, y))
        result["out"] = api.add(pool[-1], pool[-2])

    from gnark_tpu.test_engine import TestEngine
    probe = type("P", (), {"a": a, "b": b, "c": c})()
    try:
        probing_define(probe, TestEngine(field))
        expected = result["out"]
        engine_ok = True
    except Exception:
        engine_ok = False
        expected = 0

    inst = Circ(a=a, b=b, c=c, out=expected)
    assert is_solved(inst, field) == engine_ok, f"seed={seed} engine"

    try:
        cs = compile_circuit(Circ(), field)
    except (ZeroDivisionError, ValueError):
        # compile-time failure (e.g. division by a constant zero) — the
        # engine must have failed too (gnark panics likewise)
        assert not engine_ok, f"seed={seed} compile failed, engine passed"
        return
    pub, sec = witness(inst, cs)
    try:
        solve(cs, pub, sec)
        py_ok = True
    except SolverError:
        py_ok = False
    assert py_ok == engine_ok, f"seed={seed} python solver disagrees"
    if supports(cs):
        try:
            solve_native(cs, pub, sec)
            nat_ok = True
        except SolverError:
            nat_ok = False
        assert nat_ok == engine_ok, f"seed={seed} native solver disagrees"


@pytest.mark.parametrize("seed", range(10))
def test_fuzz_tinyfield(seed):
    rng = random.Random(1000 + seed)
    q = TINY.modulus
    for vals in [(0, 0, 0), (1, 0, q - 1),
                 (rng.randrange(q), rng.randrange(q), rng.randrange(q))]:
        run_case(seed, TINY, *vals)


@pytest.mark.parametrize("seed", range(5))
def test_fuzz_bn254(seed):
    rng = random.Random(2000 + seed)
    q = BN.modulus
    run_case(seed, BN, rng.randrange(q), rng.randrange(q), rng.randrange(q))
