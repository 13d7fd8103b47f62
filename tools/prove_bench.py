import sys; sys.path.insert(0, "/root/repo")
"""Groth16 prove-time benchmark at real circuit sizes (TPU).

Usage: python tools/prove_bench.py [log2_constraints]
"""
import json
import os
import random
import time

os.makedirs("/root/.cache/gnark_tpu_xla_tpu", exist_ok=True)
import jax
from gnark_tpu.utils.cachekey import setup_cache; setup_cache()

from gnark_tpu import fields
from gnark_tpu.backend import groth16
from gnark_tpu.frontend import Circuit, Public, Secret, compile_circuit, \
    witness

LOG2N = int(sys.argv[1]) if len(sys.argv) > 1 else 14
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

t0 = time.time()
pk, vk = groth16.setup(cs, "bn254", rng=random.Random(5))
t_setup = time.time() - t0

t0 = time.time()
proof = groth16.prove(cs, pk, pub, sec, rng=random.Random(6))
t_first = time.time() - t0      # includes compiles
assert groth16.verify(proof, vk, pub)
best = float("inf")
for i in range(2):
    t0 = time.time()
    groth16.prove(cs, pk, pub, sec, rng=random.Random(7 + i))
    best = min(best, time.time() - t0)

print(json.dumps({
    "n_constraints": cs.nb_constraints,
    "compile_s": round(t_compile, 1),
    "setup_s": round(t_setup, 1),
    "prove_first_s": round(t_first, 1),
    "prove_s": round(best, 2),
    "constraints_per_s": round(cs.nb_constraints / best),
}))
