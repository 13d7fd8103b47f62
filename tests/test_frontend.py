"""Frontend + host solver tests (pure Python; mirror the reference's
tiny circuit corpus, internal/backend/circuits/)."""

import pytest

from gnark_tpu import fields
from gnark_tpu.constraint import SolverError, solve
from gnark_tpu.frontend import Circuit, Public, Secret, compile_circuit, witness

F = fields.BN254_FR
TINY = fields.TINYFIELD


class Cubic(Circuit):
    """x**3 + x + 5 == y (reference examples/cubic/cubic.go)."""
    x: Secret
    y: Public

    def define(self, api):
        x3 = api.mul(self.x, self.x, self.x)
        api.assert_is_equal(api.add(x3, self.x, 5), self.y)


def solve_circuit(circ_cls, assigned, field=F, **kw):
    cs = compile_circuit(circ_cls(), field, **kw)
    pub, sec = witness(assigned, cs)
    return cs, solve(cs, pub, sec)


def test_cubic_ok():
    cs, sol = solve_circuit(Cubic, Cubic(x=3, y=35))
    assert cs.nb_constraints == 3
    assert sol.values[: cs.nb_public] == [1, 35]


def test_cubic_bad_witness():
    with pytest.raises(SolverError, match="not satisfied"):
        solve_circuit(Cubic, Cubic(x=3, y=36))


class AllOps(Circuit):
    a: Secret
    b: Secret
    c: Public

    def define(self, api):
        s = api.add(self.a, self.b)
        d = api.sub(self.a, self.b)
        m = api.mul(s, d)                       # a^2 - b^2
        q_ = api.div(m, self.b)                 # (a^2-b^2)/b
        i = api.inverse(self.b)
        api.assert_is_equal(api.mul(q_, self.b), m)
        api.assert_is_equal(api.mul(i, self.b), 1)
        api.assert_is_equal(api.mul_acc(self.c, 0, 123), self.c)
        api.assert_is_different(s, d)           # needs b != 0


def test_all_ops():
    a, b = 17, 5
    c = 1
    solve_circuit(AllOps, AllOps(a=a, b=b, c=c))


class Bits(Circuit):
    x: Secret
    y: Public

    def define(self, api):
        bits = api.to_binary(self.x, 8)
        api.assert_is_equal(bits[0], 1)          # x odd
        back = api.from_binary(bits)
        api.assert_is_equal(back, self.x)
        api.assert_is_equal(api.from_binary(bits[4:]), self.y)  # x >> 4


def test_bits():
    solve_circuit(Bits, Bits(x=0xA7, y=0xA))
    with pytest.raises(SolverError):
        solve_circuit(Bits, Bits(x=0xA6, y=0xA))   # even x
    with pytest.raises(SolverError):
        solve_circuit(Bits, Bits(x=0x1A7, y=0x1A))  # 9 bits


class Booleans(Circuit):
    a: Secret
    b: Secret
    and_: Public
    or_: Public
    xor_: Public

    def define(self, api):
        api.assert_is_equal(api.and_(self.a, self.b), self.and_)
        api.assert_is_equal(api.or_(self.a, self.b), self.or_)
        api.assert_is_equal(api.xor(self.a, self.b), self.xor_)


@pytest.mark.parametrize("a,b", [(0, 0), (0, 1), (1, 0), (1, 1)])
def test_booleans(a, b):
    solve_circuit(Booleans, Booleans(a=a, b=b, and_=a & b, or_=a | b,
                                     xor_=a ^ b))


def test_boolean_rejects_non_bit():
    with pytest.raises(SolverError):
        solve_circuit(Booleans, Booleans(a=2, b=1, and_=0, or_=1, xor_=1))


class SelectZero(Circuit):
    c: Secret
    a: Secret
    b: Secret
    out: Public
    z: Public

    def define(self, api):
        api.assert_is_equal(api.select(self.c, self.a, self.b), self.out)
        api.assert_is_equal(api.is_zero(self.a), self.z)
        t = api.lookup2(0, 1, 10, 20, 30, 40)    # b0=0,b1=1 -> t2
        api.assert_is_equal(t, 30)


def test_select_iszero():
    solve_circuit(SelectZero, SelectZero(c=1, a=7, b=9, out=7, z=0))
    solve_circuit(SelectZero, SelectZero(c=0, a=0, b=9, out=9, z=1))


class Compare(Circuit):
    a: Secret
    b: Secret
    sign: Public

    def define(self, api):
        api.assert_is_equal(api.cmp(self.a, self.b), self.sign)
        api.assert_is_less_or_equal(api.select(
            api.is_zero(api.add(self.sign, 1)), self.a, self.b),
            api.select(api.is_zero(api.add(self.sign, 1)), self.b, self.a))


@pytest.mark.parametrize("a,b,sign", [(5, 9, -1), (9, 5, 1), (7, 7, 0)])
def test_cmp_tiny(a, b, sign):
    solve_circuit(Compare, Compare(a=a, b=b, sign=sign % TINY.modulus),
                  field=TINY)


class LessEqConst(Circuit):
    x: Secret

    def define(self, api):
        api.assert_is_less_or_equal(self.x, 100)


def test_less_or_equal_const():
    solve_circuit(LessEqConst, LessEqConst(x=100))
    solve_circuit(LessEqConst, LessEqConst(x=0))
    with pytest.raises(SolverError):
        solve_circuit(LessEqConst, LessEqConst(x=101))


class Crumb(Circuit):
    x: Secret

    def define(self, api):
        api.assert_is_crumb(self.x)


def test_crumb():
    for v in range(4):
        solve_circuit(Crumb, Crumb(x=v))
    with pytest.raises(SolverError):
        solve_circuit(Crumb, Crumb(x=4))


class Arrays(Circuit):
    xs: list[Secret]
    total: Public

    def __init__(self, n=4, **kw):
        self.xs = [None] * n
        super().__init__(**kw)

    def define(self, api):
        acc = 0
        for x in self.xs:
            acc = api.add(acc, x)
        api.assert_is_equal(acc, self.total)


def test_arrays():
    c = Arrays()
    c.xs = [1, 2, 3, 4]
    c.total = 10
    cs = compile_circuit(Arrays(), F)
    pub, sec = witness(c, cs)
    solve(cs, pub, sec)


def test_hint_user_registered():
    from gnark_tpu.constraint import register_hint

    @register_hint("test_sqrt_hint")
    def _sqrt(q, inputs):
        # naive sqrt for tiny fields
        x = inputs[0]
        for y in range(q):
            if y * y % q == x:
                return [y]
        raise ValueError("no sqrt")

    class Sqrt(Circuit):
        x: Secret
        y: Public

        def define(self, api):
            r = api.new_hint("test_sqrt_hint", 1, self.x)[0]
            api.assert_is_equal(api.mul(r, r), self.x)

    solve_circuit(Sqrt, Sqrt(x=36 % TINY.modulus, y=6), field=TINY)


def test_levels_structure():
    cs = compile_circuit(Cubic(), F)
    # x*x (lvl 0) -> x2*x (lvl 1) -> assert (lvl 2)
    assert len(cs.levels) == 3
    assert cs.summary().startswith("r1cs over bn254_fr")


def test_unconstrained_input_check():
    """Opt-in unconstrained-secret detection (reference
    IgnoreUnconstrainedInputs semantics, inverted default)."""
    import pytest as _p
    from gnark_tpu import fields
    from gnark_tpu.frontend import Circuit, Public, Secret, \
        compile_circuit

    class Loose(Circuit):
        x: Secret
        unused: Secret
        y: Public

        def define(self, api):
            api.assert_is_equal(api.mul(self.x, self.x), self.y)

    compile_circuit(Loose(), fields.BN254_FR)          # default: ok
    with _p.raises(ValueError, match="unconstrained"):
        compile_circuit(Loose(), fields.BN254_FR,
                        check_unconstrained=True)

    class Tight(Circuit):
        x: Secret
        y: Public

        def define(self, api):
            api.assert_is_equal(api.mul(self.x, self.x), self.y)

    compile_circuit(Tight(), fields.BN254_FR, check_unconstrained=True)


def test_compress_threshold():
    """Long linexps collapse into one wire past CompressThreshold
    (reference builder.go:476-489; frontend.WithCompressThreshold
    default 300)."""
    class Wide(Circuit):
        xs: list[Secret]
        y: Public

        def __init__(self, **kw):
            self.xs = [None] * 400
            super().__init__(**kw)

        def define(self, api):
            s = api.add(self.xs[0], self.xs[1], *self.xs[2:])
            api.assert_is_equal(api.mul(s, s), self.y)

    cs = compile_circuit(Wide(), F)
    # compression wire + square + assert
    assert cs.nb_constraints == 3
    # every constraint row stays short
    for c in cs.r1cs:
        assert max(len(c.l), len(c.r), len(c.o)) <= 401
    q = F.modulus
    vals = list(range(1, 401))
    s = sum(vals) % q
    w = Wide(xs=vals, y=s * s % q)
    cs2, sol = solve_circuit(Wide, w)
    assert sol.values[1] == s * s % q
