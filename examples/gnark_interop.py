"""gnark interop end-to-end: our compiler <-> gnark's binary formats.

1. compile a circuit here and EXPORT it as a gnark .r1cs blob
   (io/gnark_cs_writer.py: intcomp-packed binary + core-det CBOR);
2. reload the blob through the gnark reader (io/gnark_cs.py) as a
   gnark toolchain would;
3. prove with the default gnark-bit-exact Fiat-Shamir conventions;
4. serialize the proof + verifying key in gnark's binary layouts
   (io/gnark.py) and read them back.

Also loads the gnark-GENERATED fixture checked in from the reference
(tests/data/gnark_fixtures/issue1045.r1cs) and proves it with gnark's
own witness values.

Run: python examples/gnark_interop.py
"""

import random
import sys

sys.path.insert(0, ".")

from gnark_tpu import fields
from gnark_tpu.backend import groth16
from gnark_tpu.frontend import Circuit, Public, Secret, compile_circuit, \
    witness
from gnark_tpu.io import gnark as gnark_io
from gnark_tpu.io.gnark_cs import load_gnark_cs, read_gnark_cs
from gnark_tpu.io.gnark_cs_writer import cs_to_gnark_bytes


class Cubic(Circuit):
    x: Secret
    y: Public

    def define(self, api):
        x3 = api.mul(self.x, self.x, self.x)
        api.assert_is_equal(api.add(x3, self.x, 5), self.y)


def main():
    rng = random.Random(42)

    # --- ours -> gnark format -> back -------------------------------------
    cs = compile_circuit(Cubic(), fields.BN254_FR)
    blob = cs_to_gnark_bytes(cs)
    print(f"exported .r1cs blob: {len(blob)} bytes")
    cs2 = read_gnark_cs(blob)
    assert cs2.nb_constraints == cs.nb_constraints

    pk, vk = groth16.setup(cs2, "bn254", rng=rng)
    pub, sec = witness(Cubic(x=3, y=35), cs)
    proof = groth16.prove(cs2, pk, pub, sec, rng=rng)
    assert groth16.verify(proof, vk, pub)

    # gnark binary proof + vk round-trip
    pbytes = gnark_io.write_groth16_proof(proof, "bn254")
    p2 = gnark_io.read_groth16_proof("bn254", pbytes)
    assert p2.ar == proof.ar and p2.krs == proof.krs
    vbytes = gnark_io.write_groth16_vk(vk)
    print(f"gnark-format proof: {len(pbytes)} B, vk: {len(vbytes)} B")

    # --- gnark-generated fixture -> ours ----------------------------------
    import os
    fx = os.path.join(os.path.dirname(__file__), "..", "tests",
                      "data", "gnark_fixtures", "issue1045.r1cs")
    gcs = load_gnark_cs(fx)
    hints = {
        "github.com/consensys/gnark/internal/regression_tests/"
        "issue1045.ExplicitHint": lambda q, ins: [ins[0] % q],
        "github.com/consensys/gnark/internal/regression_tests/"
        "issue1045.glob..func1": lambda q, ins: [ins[0] % q],
    }
    gpk, gvk = groth16.setup(gcs, "bn254", rng=rng)
    gproof = groth16.prove(gcs, gpk, [123, 333], [], rng=rng,
                           hint_overrides=hints)
    ok = groth16.verify(gproof, gvk, [123, 333])
    print("verified:", ok and groth16.verify(proof, vk, pub))
    assert ok


if __name__ == "__main__":
    main()
