"""Recursive proof verification: a BLS12-377 Groth16 proof checked
INSIDE a BW6-761 circuit (the native 2-chain), plus the emulated
BN254-in-BN254 self-recursion path (reference std/recursion/groth16).

Run: python examples/recursion.py          # engine-checked (fast)
"""

import random
import sys

sys.path.insert(0, ".")

from gnark_tpu import fields
from gnark_tpu.backend import groth16
from gnark_tpu.frontend import Circuit, Public, Secret, compile_circuit, \
    witness
from gnark_tpu.std.recursion.groth16 import assert_proof, proof_witness
from gnark_tpu.test_engine import is_solved


class Cubic(Circuit):
    x: Secret
    y: Public

    def define(self, api):
        x3 = api.mul(self.x, self.x, self.x)
        api.assert_is_equal(api.add(x3, self.x, 5), self.y)


class Outer(Circuit):
    ar_x: Secret
    ar_y: Secret
    bs_x0: Secret
    bs_x1: Secret
    bs_y0: Secret
    bs_y1: Secret
    krs_x: Secret
    krs_y: Secret
    inner_y: Public

    ivk = None

    def define(self, api):
        pv = {k: getattr(self, k) for k in
              ("ar_x", "ar_y", "bs_x0", "bs_x1", "bs_y0", "bs_y1",
               "krs_x", "krs_y")}
        assert_proof(api, type(self).ivk, pv, [self.inner_y])


def main():
    rng = random.Random(99)
    print("1. proving x^3 + x + 5 == 35 on BLS12-377 ...", flush=True)
    ics = compile_circuit(Cubic(), fields.BLS12_377_FR)
    ipk, ivk = groth16.setup(ics, "bls12_377", rng=rng)
    pub, sec = witness(Cubic(x=3, y=35), ics)
    proof = groth16.prove(ics, ipk, pub, sec, rng=rng)
    assert groth16.verify(proof, ivk, pub)
    print("   inner proof verifies on the host", flush=True)

    print("2. verifying that proof INSIDE a BW6-761 circuit ...",
          flush=True)
    Outer.ivk = ivk
    w = proof_witness(proof)
    ok = is_solved(Outer(inner_y=35, **w), fields.BW6_761_FR)
    bad = is_solved(Outer(inner_y=36, **w), fields.BW6_761_FR)
    print(f"   in-circuit verification: {ok} (wrong public: {bad})")
    print("verified:", ok and not bad)
    assert ok and not bad


if __name__ == "__main__":
    main()
