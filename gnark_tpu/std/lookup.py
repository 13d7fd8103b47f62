"""Log-derivative lookup tables (reference std/lookup/logderivlookup).

Append-only table; Lookup(index) returns the table value via a hint and
the whole batch of queries is proven with a log-derivative set-
inclusion argument at finalization (deferred to after define(), like
the reference's BlueprintLookupHint + committer flow):

  with challenge a (from api.commit over everything involved) and
  packing coefficient b = a^2 (both unpredictable to the prover):

     sum_j 1/(a - (idx_j + b*val_j)) == sum_i m_i/(a - (i + b*T_i))

  where m_i is the multiplicity of row i among the queries (hint).
"""

from __future__ import annotations

from gnark_tpu.constraint.hints import register_hint


@register_hint("lookup_values")
def _lookup_values(q, inputs):
    """[nrows, T_0..T_{r-1}, idx_0..] -> values at the indices."""
    nrows = inputs[0]
    table = inputs[1:1 + nrows]
    idxs = inputs[1 + nrows:]
    out = []
    for ix in idxs:
        if ix >= nrows:
            raise ValueError(f"lookup index {ix} out of range {nrows}")
        out.append(table[ix])
    return out


@register_hint("lookup_counts")
def _lookup_counts(q, inputs):
    """[nrows, idx_0..] -> multiplicity of each row among the queries."""
    nrows = inputs[0]
    counts = [0] * nrows
    for ix in inputs[1:]:
        if ix >= nrows:
            raise ValueError(f"lookup index {ix} out of range {nrows}")
        counts[ix] += 1
    return counts


class Table:
    """Append-only lookup table (reference logderivlookup.New)."""

    def __init__(self, api):
        self.api = api
        self.entries = []       # circuit values
        self.queries = []       # (idx_var, val_var)
        self._finalized = False
        api.defer_(self._finalize)

    def insert(self, value) -> int:
        assert not self._finalized
        self.entries.append(value)
        return len(self.entries) - 1

    def lookup(self, *indices):
        assert not self._finalized
        api = self.api
        n = len(self.entries)
        vals = api.new_hint("lookup_values", len(indices),
                            n, *self.entries, *indices)
        self.queries.extend(zip(indices, vals))
        return vals

    def _finalize(self, api) -> None:
        if self._finalized or not self.queries:
            self._finalized = True
            return
        self._finalized = True
        n = len(self.entries)
        m = api.new_hint("lookup_counts", n, n,
                         *[ix for ix, _ in self.queries])
        # challenges from a commitment over everything involved
        involved = [v for pair in self.queries for v in pair] + \
            list(self.entries) + list(m)
        a = api.commit(*involved)
        b = api.mul(a, a)
        # accumulate with ONE n-ary add per side: pairwise `lhs =
        # add(lhs, t)` grows the linear expression each step (O(n^2))
        lterms = []
        for ix, val in self.queries:
            packed = api.add(ix, api.mul(b, val))
            lterms.append(api.inverse(api.sub(a, packed)))
        rterms = []
        for i, entry in enumerate(self.entries):
            packed = api.add(i, api.mul(b, entry))
            # r_i = m_i / (a - packed):  (a - packed) * r_i == m_i
            rterms.append(api.div_unchecked(m[i], api.sub(a, packed)))
        lhs = api.add(lterms[0], 0, *lterms[1:])
        rhs = api.add(rterms[0], 0, *rterms[1:])
        api.assert_is_equal(lhs, rhs)
