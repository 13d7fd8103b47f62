"""Keccak-256 gadget vs the host implementation / known vectors."""

from gnark_tpu import fields
from gnark_tpu.frontend import Circuit, Public, Secret, compile_circuit, witness
from gnark_tpu.std.hash import sha3
from gnark_tpu.test_engine import is_solved
from gnark_tpu.utils.keccak import keccak256

F = fields.BN254_FR
MSG = b"abc"


class KeccakCircuit(Circuit):
    lanes: list[Secret]
    d0: Public

    def __init__(self, **kw):
        self.lanes = [None] * 17
        super().__init__(**kw)

    def define(self, api):
        digest = sha3.keccak256_of_lanes(api, [self.lanes])
        api.assert_is_equal(digest[0], self.d0)


def test_keccak_gadget_matches_host():
    blocks = sha3.pad_keccak_lanes(MSG)
    assert len(blocks) == 1
    want = keccak256(MSG)                 # matches known "abc" vector
    d0 = int.from_bytes(want[:8], "little")
    c = KeccakCircuit(d0=d0)
    c.lanes = blocks[0]
    assert is_solved(c, F)
    bad = KeccakCircuit(d0=d0 + 1)
    bad.lanes = blocks[0]
    assert not is_solved(bad, F)


def test_keccak_native_solver():
    from gnark_tpu.native import solve_native
    blocks = sha3.pad_keccak_lanes(MSG)
    want = keccak256(MSG)
    d0 = int.from_bytes(want[:8], "little")
    cs = compile_circuit(KeccakCircuit(), F)
    c = KeccakCircuit(d0=d0)
    c.lanes = blocks[0]
    pub, sec = witness(c, cs)
    solve_native(cs, pub, sec)
