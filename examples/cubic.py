"""Prove knowledge of x with x**3 + x + 5 == y (reference examples/cubic).

Run: python examples/cubic.py
"""

import random
import sys

sys.path.insert(0, ".")

from gnark_tpu import fields
from gnark_tpu.backend import groth16
from gnark_tpu.frontend import Circuit, Public, Secret, compile_circuit, witness


class Cubic(Circuit):
    x: Secret
    y: Public

    def define(self, api):
        x3 = api.mul(self.x, self.x, self.x)
        api.assert_is_equal(api.add(x3, self.x, 5), self.y)


def main():
    cs = compile_circuit(Cubic(), fields.BN254_FR)
    print("compiled:", cs.summary())
    pk, vk = groth16.setup(cs, "bn254", rng=random.Random(0))
    pub, sec = witness(Cubic(x=3, y=35), cs)
    proof = groth16.prove(cs, pk, pub, sec)
    print("proof Ar =", proof.ar)
    ok = groth16.verify(proof, vk, pub)
    print("verified:", ok)
    assert ok


if __name__ == "__main__":
    main()
