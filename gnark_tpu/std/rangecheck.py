"""Range-check gadget (reference std/rangecheck).

The reference auto-selects between a native range checker, a
commitment-based log-derivative argument, and plain binary
decomposition (rangecheck.go:1-34). Both the binary path and the
commit-based log-derivative path are implemented; the latter amortizes
across many checked values (one shared table + one commitment).
"""

from __future__ import annotations

from gnark_tpu.std.lookup import Table


def check(api, v, nbits: int) -> None:
    """Assert v < 2^nbits."""
    api.to_binary(v, nbits)


def check_less_than(api, v, bound: int) -> None:
    """Assert v < bound (constant bound)."""
    api.assert_is_less_or_equal(v, bound - 1)


def check_many_logderiv(api, values, nbits: int) -> None:
    """Assert every value < 2^nbits via one shared lookup table
    (the log-derivative argument proves index membership; an index
    out of [0, 2^nbits) is unsatisfiable). Amortizes much better than
    per-value binary decomposition for large batches."""
    t = Table(api)
    for i in range(1 << nbits):
        t.insert(i)
    outs = t.lookup(*values)
    for v, o in zip(values, outs):
        api.assert_is_equal(o, v)   # table[i] == i pins value == index
