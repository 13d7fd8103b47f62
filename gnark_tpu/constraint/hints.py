"""Hint registry.

Analog of the reference's `constraint/solver` hint system
(constraint/solver/hint.go:15-90, hint_registry.go): a hint is a host
function computing witness values outside the constraint system; its
outputs are then *constrained* by the circuit. Signature:

    hint(q: int, inputs: list[int]) -> list[int]

with q the field modulus and all values plain Python ints in [0, q).
"""

from __future__ import annotations

from typing import Callable

HINTS: dict[str, Callable] = {}


def register_hint(name: str):
    def deco(fn):
        if name in HINTS and HINTS[name] is not fn:
            raise ValueError(f"hint {name!r} already registered")
        HINTS[name] = fn
        return fn
    return deco


def get_hint(name: str) -> Callable:
    try:
        return HINTS[name]
    except KeyError:
        raise KeyError(f"unknown hint {name!r}; registered: {sorted(HINTS)}")


# -- built-in hints ----------------------------------------------------------

@register_hint("to_bits")
def _to_bits(q, inputs):
    """inputs: [x, nbits] -> nbits little-endian bits of x."""
    x, n = inputs[0], inputs[1]
    return [(x >> i) & 1 for i in range(n)]


@register_hint("inv_zero")
def _inv_zero(q, inputs):
    """x^-1, or 0 when x == 0 (reference: solver.go native invZeroHint)."""
    x = inputs[0] % q
    return [0 if x == 0 else pow(x, -1, q)]


@register_hint("is_zero")
def _is_zero(q, inputs):
    """-> [m, xinv]: m = (x == 0), xinv = x^-1 or 0."""
    x = inputs[0] % q
    return [1 if x == 0 else 0, 0 if x == 0 else pow(x, -1, q)]


@register_hint("div")
def _div(q, inputs):
    """a/b with 0/0 = 0 (DivUnchecked semantics)."""
    a, b = inputs[0] % q, inputs[1] % q
    if b == 0:
        return [0]
    return [a * pow(b, -1, q) % q]
