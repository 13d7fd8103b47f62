"""Serialization round-trips (reference io/roundtrip.go pattern)."""

from gnark_tpu import fields, io
from gnark_tpu.constraint import solve
from gnark_tpu.frontend import compile_circuit, witness
from gnark_tpu.frontend.scs import SCSBuilder

from tests.test_frontend import Bits, Cubic

F = fields.BN254_FR


def test_witness_binary_roundtrip():
    pub, sec = [35], [3, 7]
    data = io.write_witness(pub, sec, F)
    p2, s2 = io.read_witness(data, F)
    assert p2 == pub and s2 == sec
    # element width = 32 bytes for bn254
    assert len(data) == 12 + 3 * 32


def test_cs_roundtrip_r1cs():
    cs = compile_circuit(Bits(), F)
    data = io.dump_cs(cs)
    cs2 = io.load_cs(data)
    assert io.dump_cs(cs2) == data
    pub, sec = witness(Bits(x=0xA7, y=0xA), cs2)
    sol = solve(cs2, pub, sec)
    assert sol.values[:2] == [1, 0xA]


def test_cs_roundtrip_scs():
    cs = compile_circuit(Cubic(), F, builder_cls=SCSBuilder)
    data = io.dump_cs(cs)
    cs2 = io.load_cs(data)
    assert io.dump_cs(cs2) == data
    pub, sec = witness(Cubic(x=3, y=35), cs2)
    solve(cs2, pub, sec)


def test_witness_json_schema_roundtrip():
    import json
    from gnark_tpu import fields
    from gnark_tpu.frontend import Circuit, Public, Secret, \
        compile_circuit, witness
    from gnark_tpu.io.serialize import witness_from_json, witness_to_json

    class C(Circuit):
        y: Public
        xs: list[Secret]

        def __init__(self, **kw):
            self.xs = [None] * 2
            super().__init__(**kw)

        def define(self, api):
            api.assert_is_equal(api.add(self.xs[0], self.xs[1]), self.y)

    cs = compile_circuit(C(), fields.BN254_FR)
    inst = C(y=7)
    inst.xs = [3, 4]
    js = witness_to_json(inst, cs)
    d = json.loads(js)
    assert d["public"]["y"] == "0x7"
    assert d["secret"]["xs[0]"] == "0x3"
    back = C()
    back.xs = [None] * 2
    witness_from_json(back, js)
    assert witness(back, cs) == witness(inst, cs)
