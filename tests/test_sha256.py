"""SHA-256 gadget vs hashlib (engine + solver)."""

import hashlib

from gnark_tpu import fields
from gnark_tpu.constraint import solve
from gnark_tpu.frontend import Circuit, Public, Secret, compile_circuit, witness
from gnark_tpu.std.hash import sha256 as sha
from gnark_tpu.test_engine import is_solved

F = fields.BN254_FR
MSG = b"gnark-tpu sha256 test vector"


class Sha256Circuit(Circuit):
    words: list[Secret]
    d0: Public

    def __init__(self, nwords=16, **kw):
        self.words = [None] * nwords
        super().__init__(**kw)

    def define(self, api):
        digest = sha.sha256_of_words(api, [self.words])
        api.assert_is_equal(digest[0], self.d0)


def test_sha256_single_block():
    blocks = sha.pad_message_words(MSG)
    assert len(blocks) == 1
    want = hashlib.sha256(MSG).digest()
    d0 = int.from_bytes(want[:4], "big")
    c = Sha256Circuit()
    c.words = blocks[0]
    c.d0 = d0
    assert is_solved(c, F)
    bad = Sha256Circuit()
    bad.words = blocks[0]
    bad.d0 = d0 + 1
    assert not is_solved(bad, F)


def test_sha256_solver_native():
    from gnark_tpu.native import solve_native
    blocks = sha.pad_message_words(MSG)
    want = hashlib.sha256(MSG).digest()
    d0 = int.from_bytes(want[:4], "big")
    cs = compile_circuit(Sha256Circuit(), F)
    c = Sha256Circuit()
    c.words = blocks[0]
    c.d0 = d0
    pub, sec = witness(c, cs)
    sol = solve_native(cs, pub, sec)
    sol2 = solve(cs, pub, sec)
    assert sol.values == sol2.values
