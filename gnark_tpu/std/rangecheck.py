"""Range-check gadget (reference std/rangecheck).

The reference auto-selects between a native range checker, a
commitment-based log-derivative argument, and plain binary
decomposition (rangecheck.go:1-34). Both the binary path and the
commit-based log-derivative path are implemented; the latter amortizes
across many checked values (one shared table + one commitment).
"""

from __future__ import annotations

from gnark_tpu.constraint.hints import register_hint
from gnark_tpu.std.lookup import Table

CHUNK_BITS = 12          # shared-table chunk width (reference uses
                         # a size-driven baseLength; 12 balances table
                         # cost vs queries for 10^4-10^6 checks)


def check(api, v, nbits: int) -> None:
    """Assert v < 2^nbits."""
    api.to_binary(v, nbits)


@register_hint("rc_chunks")
def _rc_chunks(q, inputs):
    """[v, nch, w] -> nch little-endian w-bit chunks of v."""
    v, nch, w = inputs[0], inputs[1], inputs[2]
    m = (1 << w) - 1
    return [(v >> (w * i)) & m for i in range(nch)]


class TableRangeChecker:
    """Shared-table range checker (reference std/internal/logderivprecomp
    + rangecheck commit path): queues (value, nbits) checks during
    Define and finalizes ONE identity lookup table + ONE log-derivative
    commitment for all of them. Per 64-bit limb this costs ~1 hint +
    ~7 lookup queries instead of 64 boolean constraints — the
    difference between a feasible and an infeasible emulated-pairing
    circuit.

    Obtain via `checker(api)` (one instance per builder)."""

    def __init__(self, api, chunk_bits: int = CHUNK_BITS):
        self.api = api
        self.w = chunk_bits
        self.pending = []        # (var, nbits)
        api.defer_(self._finalize)

    def check(self, v, nbits: int) -> None:
        if isinstance(v, int):
            assert 0 <= v < (1 << nbits), f"constant {v} >= 2^{nbits}"
            return
        if nbits == 0:
            self.api.assert_is_equal(v, 0)
            return
        self.pending.append((v, nbits))

    def _decompose(self, v, nbits):
        """-> list of (chunk_var_scaled, ) lookup indices pinning
        v < 2^nbits."""
        api, w = self.api, self.w
        if nbits <= w:
            # single chunk: scale so the table bound gives exactly nbits
            sh = w - nbits
            return [api.mul(v, 1 << sh) if sh else v]
        nch = -(-nbits // w)
        rem = nbits - (nch - 1) * w
        chunks = api.new_hint("rc_chunks", nch, v, nch, w)
        acc = 0
        for i, c in enumerate(chunks):
            acc = api.add(acc, api.mul(c, 1 << (w * i)))
        api.assert_is_equal(acc, v)
        idxs = list(chunks[:-1])
        top = chunks[-1]
        sh = w - rem
        idxs.append(api.mul(top, 1 << sh) if sh else top)
        return idxs

    def _finalize(self, api) -> None:
        if not self.pending:
            return
        # size-driven chunk width (the reference's baseLength,
        # rangecheck.go getBaseLength): minimize
        # table(2^w) + queries(sum ceil(nbits/w)) * ~2 so a single
        # emulated mul doesn't pay a 4096-row table
        best, best_cost = self.w, None
        for w in range(4, 17):
            cost = (1 << w) + 2 * sum(-(-nb // w)
                                      for _, nb in self.pending)
            if best_cost is None or cost < best_cost:
                best, best_cost = w, cost
        self.w = best
        idxs = []
        for v, nbits in self.pending:
            idxs.extend(self._decompose(v, nbits))
        self.pending = []
        # Identity-table set inclusion, value column elided: with m_i
        # the hinted multiplicity of row i among the queries and a a
        # commitment over queries+multiplicities,
        #     sum_j 1/(a - ix_j) == sum_i m_i/(a - i)
        # pins every ix_j to [0, 2^w) — one inverse per query instead
        # of the generic table's value-hint + pack-mul + equality
        # (std/lookup.py), ~2.5x cheaper per checked chunk.
        n = 1 << self.w
        m = api.new_hint("lookup_counts", n, n, *idxs)
        a = api.commit(*(list(idxs) + list(m)))
        lterms = [api.inverse(api.sub(a, ix)) for ix in idxs]
        rterms = [api.div_unchecked(m[i], api.sub(a, i))
                  for i in range(n)]
        lhs = api.add(lterms[0], 0, *lterms[1:])
        rhs = api.add(rterms[0], 0, *rterms[1:])
        api.assert_is_equal(lhs, rhs)


def checker(api) -> TableRangeChecker:
    """The builder-scoped shared range checker (created on first use)."""
    rc = getattr(api, "_gnark_tpu_rc", None)
    if rc is None:
        rc = TableRangeChecker(api)
        api._gnark_tpu_rc = rc
    return rc


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
