"""Range-check gadget (reference std/rangecheck).

The reference auto-selects between a native range checker, a
commitment-based log-derivative argument, and plain binary
decomposition (rangecheck.go:1-34). v0 implements the binary
decomposition path; the logderiv path lands with the commitment API.
"""

from __future__ import annotations


def check(api, v, nbits: int) -> None:
    """Assert v < 2^nbits."""
    api.to_binary(v, nbits)


def check_less_than(api, v, bound: int) -> None:
    """Assert v < bound (constant bound)."""
    api.assert_is_less_or_equal(v, bound - 1)
