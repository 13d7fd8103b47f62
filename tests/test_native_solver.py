"""Native (C++) solver: differential vs the Python solver."""

import pytest

from gnark_tpu import fields
from gnark_tpu.constraint import SolverError, solve
from gnark_tpu.frontend import compile_circuit, witness
from gnark_tpu.frontend.scs import SCSBuilder
from gnark_tpu.native import solve_native, supports

from tests.test_frontend import AllOps, Bits, Booleans, Cubic


@pytest.mark.parametrize("circ,assigned", [
    (Cubic, dict(x=3, y=35)),
    (AllOps, dict(a=17, b=5, c=1)),
    (Bits, dict(x=0xA7, y=0xA)),
    (Booleans, dict(a=1, b=0, and_=0, or_=1, xor_=1)),
])
@pytest.mark.parametrize("builder", [None, SCSBuilder])
def test_native_matches_python(circ, assigned, builder):
    kw = {"builder_cls": builder} if builder else {}
    cs = compile_circuit(circ(), fields.BN254_FR, **kw)
    assert supports(cs)
    pub, sec = witness(circ(**assigned), cs)
    py = solve(cs, pub, sec)
    nat = solve_native(cs, pub, sec)
    assert nat.values == py.values
    if cs.kind == "r1cs":
        assert (nat.a, nat.b, nat.c) == (py.a, py.b, py.c)


def test_native_rejects_bad_witness():
    cs = compile_circuit(Cubic(), fields.BN254_FR)
    pub, sec = witness(Cubic(x=3, y=36), cs)
    with pytest.raises(SolverError, match="not satisfied"):
        solve_native(cs, pub, sec)


def test_native_commitment_and_lookup():
    from gnark_tpu.std.lookup import Table
    from gnark_tpu.frontend import Circuit, Public, Secret
    SBOX = [((7 * i + 3) ** 2) % 251 for i in range(16)]

    class LC(Circuit):
        x: Secret
        y: Public

        def define(self, api):
            t = Table(api)
            for v in SBOX:
                t.insert(v)
            api.assert_is_equal(t.lookup(self.x)[0], self.y)

    cs = compile_circuit(LC(), fields.BN254_FR)
    pub, sec = witness(LC(x=9, y=SBOX[9]), cs)
    py = solve(cs, pub, sec)
    nat = solve_native(cs, pub, sec)
    assert nat.values == py.values


def test_native_bw6_761_six_limbs():
    """BW6-761 fr is 377 bits -> exercises the NL=6 template
    instantiation (native/solver.cpp dispatch)."""
    from gnark_tpu.native import supports

    F = fields.FIELDS["bw6_761_fr"]
    cs = compile_circuit(Cubic(), F)
    assert supports(cs)
    pub, sec = witness(Cubic(x=3, y=35), cs)
    nat = solve_native(cs, pub, sec)
    py = solve(cs, pub, sec)
    assert nat.values == py.values
    assert nat.a == py.a and nat.b == py.b and nat.c == py.c


def test_native_scs_commitment_rows():
    """SCS PLONK commitment rows (COMMITTED/COMMITMENT markers) are
    skipped by the native solver like the Python one."""
    from gnark_tpu.frontend.scs import SCSBuilder
    from gnark_tpu.std.lookup import Table
    from gnark_tpu.frontend import Circuit, Public, Secret
    SBOX = [((5 * i + 1) ** 2) % 127 for i in range(8)]

    class LC(Circuit):
        x: Secret
        y: Public

        def define(self, api):
            t = Table(api)
            for v in SBOX:
                t.insert(v)
            api.assert_is_equal(t.lookup(self.x)[0], self.y)

    cs = compile_circuit(LC(), fields.BN254_FR, builder_cls=SCSBuilder)
    assert any(c.commitment for c in cs.sparse)
    pub, sec = witness(LC(x=3, y=SBOX[3]), cs)
    py = solve(cs, pub, sec)
    nat = solve_native(cs, pub, sec)
    assert nat.values == py.values
