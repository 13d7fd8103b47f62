"""Test engine: executes define() directly over Python ints.

Analog of the reference's mock backend #1 (test/engine.go:38-99): no
constraint system at all — every API call computes on values. Used for
fast witness-validity checks and as the differential-fuzzing oracle
against the real builders + solver (SURVEY.md §4).
"""

from __future__ import annotations

from gnark_tpu.constraint.hints import get_hint
from gnark_tpu.fields import FieldParams


class EngineError(Exception):
    pass


class TestEngine:
    """Implements the frontend API protocol over plain ints."""

    def __init__(self, field: FieldParams,
                 hint_overrides: dict | None = None):
        self.q = field.modulus
        self._field = field
        self._hints = hint_overrides or {}
        self._deferred: list = []

    # -- compiler surface ----------------------------------------------

    def field(self) -> int:
        return self.q

    def field_bitlen(self) -> int:
        return self._field.bits

    def _v(self, x) -> int:
        if isinstance(x, bool):
            return int(x)
        if isinstance(x, int):
            return x % self.q
        raise TypeError(f"engine values are ints, got {type(x)}")

    def constant_value(self, v):
        return self._v(v)

    def new_hint(self, name, n_outputs, *inputs):
        fn = self._hints.get(name) or get_hint(name)
        outs = fn(self.q, [self._v(i) for i in inputs])
        if len(outs) != n_outputs:
            raise EngineError(f"hint {name}: bad output arity")
        return [o % self.q for o in outs]

    def commit(self, *values):
        """Commitment challenge: deterministic stand-in (the real
        prover binds it to a Pedersen point; reference engine.go uses
        a PRNG value)."""
        return self.new_hint("bsb22", 1, *values)[0]

    def defer_(self, fn) -> None:
        self._deferred.append(fn)

    def run_deferred(self) -> None:
        while self._deferred:
            self._deferred.pop(0)(self)

    # -- arithmetic -------------------------------------------------------

    def add(self, a, b, *rest):
        return (self._v(a) + self._v(b) + sum(self._v(r) for r in rest)) % self.q

    def sub(self, a, b, *rest):
        return (self._v(a) - self._v(b) - sum(self._v(r) for r in rest)) % self.q

    def neg(self, a):
        return (-self._v(a)) % self.q

    def mul(self, a, b, *rest):
        r = self._v(a) * self._v(b) % self.q
        for x in rest:
            r = r * self._v(x) % self.q
        return r

    def mul_acc(self, a, b, c):
        return (self._v(a) + self._v(b) * self._v(c)) % self.q

    def div_unchecked(self, a, b):
        a, b = self._v(a), self._v(b)
        if b == 0:
            if a == 0:
                return 0
            raise EngineError("division by zero")
        return a * pow(b, -1, self.q) % self.q

    def div(self, a, b):
        b = self._v(b)
        if b == 0:
            raise EngineError("division by zero")
        return self._v(a) * pow(b, -1, self.q) % self.q

    def inverse(self, a):
        a = self._v(a)
        if a == 0:
            raise EngineError("inverse of zero")
        return pow(a, -1, self.q)

    # -- binary -----------------------------------------------------------

    def to_binary(self, a, nbits=None):
        if nbits is None:
            nbits = self.field_bitlen()
        a = self._v(a)
        if a >= (1 << nbits):
            raise EngineError(f"{a} does not fit in {nbits} bits")
        return [(a >> i) & 1 for i in range(nbits)]

    def from_binary(self, bits):
        r = 0
        for i, b in enumerate(bits):
            b = self._v(b)
            if b not in (0, 1):
                raise EngineError("non-boolean bit")
            r += b << i
        return r % self.q

    # -- booleans ----------------------------------------------------------

    def _bool(self, a):
        a = self._v(a)
        if a not in (0, 1):
            raise EngineError(f"{a} is not boolean")
        return a

    def and_(self, a, b):
        return self._bool(a) & self._bool(b)

    def or_(self, a, b):
        return self._bool(a) | self._bool(b)

    def xor(self, a, b):
        return self._bool(a) ^ self._bool(b)

    # -- conditionals -------------------------------------------------------

    def select(self, cond, a, b):
        return self._v(a) if self._v(cond) == 1 else self._v(b)

    def lookup2(self, b0, b1, t0, t1, t2, t3):
        i = self._bool(b0) | (self._bool(b1) << 1)
        return self._v((t0, t1, t2, t3)[i])

    def is_zero(self, a):
        return 1 if self._v(a) == 0 else 0

    def cmp(self, a, b):
        a, b = self._v(a), self._v(b)
        return (1 if a > b else (self.q - 1 if a < b else 0))

    # -- assertions ----------------------------------------------------------

    def mark_boolean(self, v):
        pass

    def assert_is_equal(self, a, b):
        if self._v(a) != self._v(b):
            raise EngineError(f"assert_is_equal: {self._v(a)} != {self._v(b)}")

    def assert_is_different(self, a, b):
        if self._v(a) == self._v(b):
            raise EngineError("assert_is_different failed")

    def assert_is_boolean(self, v):
        self._bool(v)

    def assert_is_crumb(self, v):
        if self._v(v) > 3:
            raise EngineError("assert_is_crumb failed")

    def assert_is_less_or_equal(self, v, bound):
        if self._v(v) > self._v(bound):
            raise EngineError(
                f"assert_is_less_or_equal: {self._v(v)} > {self._v(bound)}")

    def println(self, fmt, *args):
        print(fmt.format(*(self._v(a) for a in args)))


def is_solved(circuit, field: FieldParams,
              hint_overrides: dict | None = None) -> bool:
    """Run define() over the assigned values; True iff no assertion
    fails (reference test/engine.go IsSolved)."""
    try:
        eng = TestEngine(field, hint_overrides)
        circuit.define(eng)
        eng.run_deferred()
        return True
    except (EngineError, ZeroDivisionError, ValueError):
        return False
