"""SCS builder: same circuit corpus as test_frontend, PLONKish gates."""

import pytest

from gnark_tpu import fields
from gnark_tpu.constraint import SolverError, solve
from gnark_tpu.frontend import compile_circuit, witness
from gnark_tpu.frontend.scs import SCSBuilder

from tests.test_frontend import (
    AllOps, Bits, Booleans, Compare, Crumb, Cubic, LessEqConst, SelectZero,
)

F = fields.BN254_FR
TINY = fields.TINYFIELD


def run(circ_cls, assigned, field=F):
    cs = compile_circuit(circ_cls(), field, builder_cls=SCSBuilder)
    pub, sec = witness(assigned, cs)
    return cs, solve(cs, pub, sec)


def test_cubic_scs():
    cs, sol = run(Cubic, Cubic(x=3, y=35))
    assert cs.kind == "scs"
    assert cs.nb_constraints >= 3
    with pytest.raises(SolverError):
        run(Cubic, Cubic(x=3, y=34))


def test_allops_scs():
    run(AllOps, AllOps(a=17, b=5, c=1))


def test_bits_scs():
    run(Bits, Bits(x=0xA7, y=0xA))
    with pytest.raises(SolverError):
        run(Bits, Bits(x=0xA6, y=0xA))


@pytest.mark.parametrize("a,b", [(0, 0), (0, 1), (1, 0), (1, 1)])
def test_booleans_scs(a, b):
    run(Booleans, Booleans(a=a, b=b, and_=a & b, or_=a | b, xor_=a ^ b))


def test_boolean_rejects_non_bit_scs():
    with pytest.raises(SolverError):
        run(Booleans, Booleans(a=2, b=1, and_=0, or_=1, xor_=1))


def test_select_iszero_scs():
    run(SelectZero, SelectZero(c=1, a=7, b=9, out=7, z=0))
    run(SelectZero, SelectZero(c=0, a=0, b=9, out=9, z=1))


@pytest.mark.parametrize("a,b,sign", [(5, 9, -1), (9, 5, 1), (7, 7, 0)])
def test_cmp_scs_tiny(a, b, sign):
    run(Compare, Compare(a=a, b=b, sign=sign % TINY.modulus), field=TINY)


def test_lesseq_crumb_scs():
    run(LessEqConst, LessEqConst(x=100))
    with pytest.raises(SolverError):
        run(LessEqConst, LessEqConst(x=101))
    run(Crumb, Crumb(x=3))
    with pytest.raises(SolverError):
        run(Crumb, Crumb(x=4))


def test_cse_dedup():
    """Identical mul gates must be shared (reference builder.go:478-640)."""
    from gnark_tpu.frontend import Circuit, Public, Secret

    class Dup(Circuit):
        x: Secret
        y: Public

        def define(self, api):
            a = api.mul(self.x, self.x)
            b = api.mul(self.x, self.x)   # CSE: same gate
            api.assert_is_equal(api.add(a, b), self.y)

    cs = compile_circuit(Dup(), F, builder_cls=SCSBuilder)
    # one mul gate + one final assert-with-add gate
    assert cs.nb_constraints == 2
