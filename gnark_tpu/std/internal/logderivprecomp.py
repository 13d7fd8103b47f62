"""Precomputed binary-function tables with a shared log-derivative
inclusion argument (reference std/internal/logderivprecomp).

Instead of bit-decomposing two 8-bit inputs and constraining a
function gate-by-gate, ALL 2^16 input pairs are precomputed into one
CONSTANT table of packed rows

    row = x | y<<8 | ret_0 << 16 | ret_1 << (16+rets[0]) | ...

and every Query(x, y) costs one hint + one packed linear combination
+ one membership term — the table rows are compile-time constants, so
each right-hand term of the log-derivative identity

    sum_j 1/(a - q_j) == sum_i m_i/(a - row_i)

has a LINEAR denominator. Instances are shared per (builder, fn): the
second gadget asking for the same function reuses the same deferred
table (the reference's kvstore-scoped New, logderivprecomp.go:36-66).

Query inputs must already be range-checked to 8 bits by the caller
(the reference's contract, logderivprecomp.go:80-82); outputs are
range-checked here by table membership.
"""

from __future__ import annotations

from gnark_tpu.constraint.hints import register_hint


@register_hint("ldp_query")
def _ldp_query(q, inputs):
    """[fnid, nret, rets-widths..., x, y] -> ret values via the
    registered python function."""
    fnid, nret = inputs[0], inputs[1]
    x, y = inputs[2 + nret], inputs[3 + nret]
    fn = _FNS[fnid]
    outs = fn(int(x), int(y))
    assert len(outs) == nret
    return [int(v) for v in outs]


_FNS: dict = {}


def register_fn(fn) -> int:
    """Register a python (x, y) -> [rets] function; returns its id."""
    for fid, f in _FNS.items():
        if f is fn:
            return fid
    fid = len(_FNS)
    _FNS[fid] = fn
    return fid


class Precomputed:
    """One precomputed function table; obtain via `new(api, fn, rets)`
    so instances are shared per builder."""

    def __init__(self, api, fn, rets):
        self.api = api
        self.fn = fn
        self.fnid = register_fn(fn)
        self.rets = list(rets)
        s = 16 + sum(rets)
        if s >= api.field().bit_length():
            raise ValueError("result does not fit the field")
        self.queries = []
        api.defer_(self._build)

    def query(self, x, y):
        """Function outputs for 8-bit inputs x, y."""
        api = self.api
        rets = api.new_hint("ldp_query", len(self.rets),
                            self.fnid, len(self.rets), *self.rets, x, y)
        packed = api.add(x, api.mul(y, 1 << 8))
        shift = 1 << 8
        for w, r in zip(self.rets, rets):
            shift <<= w
            packed = api.add(packed, api.mul(r, shift))
        self.queries.append(packed)
        return rets

    def _table_rows(self):
        rows = []
        for y in range(256):
            for x in range(256):
                outs = self.fn(x, y)
                v = x | (y << 8)
                shift = 1 << 8
                for w, o in zip(self.rets, outs):
                    shift <<= w
                    v += int(o) * shift
                rows.append(v)
        return rows

    def _build(self, api) -> None:
        if not self.queries:
            return
        rows = self._table_rows()
        # multiplicities: count row index (x | y<<8 is the row id but
        # rows are packed values — counts keyed on the packed value)
        n = len(rows)
        m = api.new_hint("ldp_counts", n, self.fnid, len(self.rets),
                         *self.rets, *self.queries)
        a = api.commit(*(list(self.queries) + list(m)))
        lterms = [api.inverse(api.sub(a, qv)) for qv in self.queries]
        rterms = [api.div_unchecked(m[i], api.sub(a, rows[i]))
                  for i in range(n)]
        lhs = api.add(lterms[0], 0, *lterms[1:])
        rhs = api.add(rterms[0], 0, *rterms[1:])
        api.assert_is_equal(lhs, rhs)


@register_hint("ldp_counts")
def _ldp_counts(q, inputs):
    """[fnid, nret, widths..., packed queries...] -> multiplicity of
    each of the 2^16 table rows among the queries."""
    fnid, nret = inputs[0], inputs[1]
    widths = inputs[2:2 + nret]
    queries = inputs[2 + nret:]
    counts = [0] * 65536
    for pv in queries:
        x = pv & 0xFF
        y = (pv >> 8) & 0xFF
        counts[x | (y << 8)] += 1
        # sanity: the packed value must match the table row
        fn = _FNS[fnid]
        outs = fn(int(x), int(y))
        v = x | (y << 8)
        shift = 1 << 8
        for w, o in zip(widths, outs):
            shift <<= int(w)
            v += int(o) * shift
        if v != pv:
            raise ValueError("logderivprecomp: query not in table")
    return counts


def new(api, fn, rets) -> Precomputed:
    """Builder-scoped shared instance per function (reference New)."""
    store = getattr(api, "_gnark_tpu_ldp", None)
    if store is None:
        store = {}
        api._gnark_tpu_ldp = store
    key = id(fn)
    if key not in store:
        store[key] = Precomputed(api, fn, rets)
    return store[key]


# -- the stock byte functions (reference std/math/uints hints) -----------

def xor_bytes(x: int, y: int):
    return [x ^ y]


def and_bytes(x: int, y: int):
    return [x & y]


def or_bytes(x: int, y: int):
    return [x | y]
