"""Merkle membership proof (reference examples/ rollup building block).

Run: python examples/merkle_membership.py
"""

import random
import sys

sys.path.insert(0, ".")

from gnark_tpu import fields
from gnark_tpu.backend import groth16
from gnark_tpu.frontend import Circuit, Public, Secret, compile_circuit, witness
from gnark_tpu.std import merkle
from gnark_tpu.std.hash.mimc import mimc_hash

DEPTH = 3


class Membership(Circuit):
    root: Public
    leaf: Secret
    path: list[Secret]
    dirs: list[Secret]

    def __init__(self, **kw):
        self.path = [None] * DEPTH
        self.dirs = [None] * DEPTH
        super().__init__(**kw)

    def define(self, api):
        merkle.verify_proof(api, self.root, self.leaf, self.path, self.dirs)


def main():
    leaves = [mimc_hash([i + 1000]) for i in range(1 << DEPTH)]
    root, prf = merkle.host_merkle_root(leaves)
    path, dirs = prf(5)

    cs = compile_circuit(Membership(), fields.BN254_FR)
    print("compiled:", cs.summary())
    pk, vk = groth16.setup(cs, "bn254", rng=random.Random(0))
    c = Membership(root=root, leaf=leaves[5])
    c.path, c.dirs = path, dirs
    pub, sec = witness(c, cs)
    proof = groth16.prove(cs, pk, pub, sec)
    ok = groth16.verify(proof, vk, pub)
    print("verified:", ok)
    assert ok


if __name__ == "__main__":
    main()
