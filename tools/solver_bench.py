import sys; sys.path.insert(0, "/root/repo")
"""Witness-solver benchmark: native C++ vs Python at large N.

Usage: python tools/solver_bench.py [log2_n]
Prints one JSON line with constraints/sec for both solvers.
"""
import json
import time

from gnark_tpu import fields
from gnark_tpu.frontend import Circuit, Public, Secret, compile_circuit, \
    witness

LOG2N = int(sys.argv[1]) if len(sys.argv) > 1 else 17
N = 1 << LOG2N
Q = fields.BN254_FR.modulus


class Chain(Circuit):
    x: Secret
    y: Public

    def define(self, api):
        acc = self.x
        for i in range(N):
            acc = api.add(api.mul(acc, acc), i)
        api.assert_is_equal(acc, self.y)


t0 = time.time()
cs = compile_circuit(Chain(), fields.BN254_FR)
t_compile = time.time() - t0

x = 3
acc = x
for i in range(N):
    acc = (acc * acc + i) % Q
inst = Chain(x=x, y=acc)
pub, sec = witness(inst, cs)

from gnark_tpu.constraint.solver import solve as py_solve
from gnark_tpu.native import solve_native

t0 = time.time()
solve_native(cs, pub, sec)
t_marshal_first = time.time() - t0          # includes one-time marshal
t0 = time.time()
solve_native(cs, pub, sec)
t_native = time.time() - t0
t0 = time.time()
py_solve(cs, pub, sec)
t_py = time.time() - t0

print(json.dumps({
    "n_constraints": cs.nb_constraints,
    "compile_s": round(t_compile, 2),
    "native_first_s": round(t_marshal_first, 3),
    "native_s": round(t_native, 3),
    "python_s": round(t_py, 3),
    "native_cps": round(cs.nb_constraints / t_native),
    "python_cps": round(cs.nb_constraints / t_py),
    "speedup": round(t_py / t_native, 2),
}))
