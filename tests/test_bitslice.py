from gnark_tpu import fields
from gnark_tpu.constraint import solve
from gnark_tpu.frontend import Circuit, Public, Secret, compile_circuit, witness
from gnark_tpu.std.math import bitslice
from gnark_tpu.test_engine import is_solved

F = fields.BN254_FR


class Slice(Circuit):
    x: Secret
    lo: Public
    hi: Public

    def define(self, api):
        lo, hi = bitslice.partition(api, self.x, 12, 32)
        api.assert_is_equal(lo, self.lo)
        api.assert_is_equal(hi, self.hi)


def test_partition():
    x = 0xDEADBEEF
    c = Slice(x=x, lo=x & 0xFFF, hi=x >> 12)
    assert is_solved(c, F)
    assert not is_solved(Slice(x=x, lo=0, hi=x >> 12), F)
    cs = compile_circuit(Slice(), F)
    pub, sec = witness(c, cs)
    solve(cs, pub, sec)
