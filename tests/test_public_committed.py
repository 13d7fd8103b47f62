"""BSB22 commitments over PUBLIC wires (reference
constraint/commitment.go NbPublicCommitted +
backend/groth16/bn254/setup.go:140-178, verify.go:79-103): public
committed values are hashed into the commitment wire value (the
SerializeCommitment suffix) but not Pedersen-committed."""

import random

import pytest

from gnark_tpu import fields
from gnark_tpu.backend import groth16
from gnark_tpu.frontend import (Circuit, Public, Secret, compile_circuit,
                                witness)


class CommitPublic(Circuit):
    x: Public
    y: Secret

    def define(self, api):
        # commit over a public AND a private wire
        c = api.commit(self.x, self.y)
        # use the commitment value so it is constrained
        api.assert_is_different(c, 0)
        api.assert_is_equal(api.mul(self.x, self.y), 12)


@pytest.fixture(scope="module")
def compiled():
    cs = compile_circuit(CommitPublic(), fields.BN254_FR)
    cm = cs.commitments[0]
    assert cm.nb_public_committed == 1, cm
    return cs


def test_public_committed_prove_verify(compiled):
    cs = compiled
    pk, vk = groth16.setup(cs, "bn254", rng=random.Random(1))
    assert vk.commitment_pac == [(1,)]
    c = CommitPublic(x=3, y=4)
    pub, sec = witness(c, cs)
    proof = groth16.prove(cs, pk, pub, sec, rng=random.Random(2))
    assert groth16.verify(proof, vk, pub)
    # wrong public input must fail
    assert not groth16.verify(proof, vk, [5])


def test_public_committed_gnark_roundtrip(compiled):
    import io as _io
    import os
    import tempfile

    from gnark_tpu.io import gnark_cs
    from gnark_tpu.io.gnark_cs_writer import cs_to_gnark_bytes

    cs = compiled
    data = cs_to_gnark_bytes(cs)
    fn = tempfile.mktemp(suffix=".r1cs")
    try:
        with open(fn, "wb") as f:
            f.write(data)
        cs2 = gnark_cs.load_gnark_cs(fn)
        cm = cs2.commitments[0]
        assert cm.nb_public_committed == 1
        pk, vk = groth16.setup(cs2, "bn254", rng=random.Random(3))
        c = CommitPublic(x=3, y=4)
        pub, sec = witness(c, cs)
        proof = groth16.prove(cs2, pk, pub, sec, rng=random.Random(4))
        assert groth16.verify(proof, vk, pub)
    finally:
        if os.path.exists(fn):
            os.unlink(fn)
