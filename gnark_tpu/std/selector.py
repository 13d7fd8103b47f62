"""Selector gadgets: Mux, Map, Slice (reference std/selector)."""

from __future__ import annotations


def mux(api, sel, *inputs):
    """inputs[sel]; constrains sel in [0, len(inputs))
    (reference std/selector/multiplexer.go Mux)."""
    n = len(inputs)
    # indicator bits: ind_i = (sel == i), exactly one must be 1
    inds = []
    total = 0
    out = 0
    for i in range(n):
        ind = api.is_zero(api.sub(sel, i))
        inds.append(ind)
        total = api.add(total, ind)
        out = api.add(out, api.mul(ind, inputs[i]))
    api.assert_is_equal(total, 1)
    return out


def map_lookup(api, query, keys, values):
    """Value whose key equals query; constrains query to be a key
    (reference std/selector/map.go Map)."""
    total = 0
    out = 0
    for k, v in zip(keys, values):
        ind = api.is_zero(api.sub(query, k))
        total = api.add(total, ind)
        out = api.add(out, api.mul(ind, v))
    api.assert_is_equal(total, 1)
    return out


def is_in_slice(api, x, values):
    """1 iff x is one of values (no constraint that it must be)."""
    prod = 1
    for v in values:
        prod = api.mul(prod, api.sub(x, v))
    return api.is_zero(prod)


def slice_mask(api, pivot, n: int):
    """Masks m_i = 1 iff i < pivot, for i in [0, n) (reference
    std/selector/slice.go building block). Constrains pivot <= n via
    the indicator sum."""
    after = 0        # becomes 1 once i == pivot
    masks = []
    for i in range(n):
        eq = api.is_zero(api.sub(pivot, i))
        after = api.add(after, eq)
        masks.append(api.sub(1, after))
    # pivot in [0, n]: either some eq fired or pivot == n
    eq_n = api.is_zero(api.sub(pivot, n))
    api.assert_is_equal(api.add(after, eq_n), 1)
    return masks


def slice_sum(api, values, start, end):
    """Sum of values[start:end] with variable bounds."""
    n = len(values)
    m_end = slice_mask(api, end, n)
    m_start = slice_mask(api, start, n)
    acc = 0
    for v, me, ms in zip(values, m_end, m_start):
        acc = api.add(acc, api.mul(v, api.sub(me, ms)))
    return acc


# -- batch inversion (reference BlueprintBatchInverse) ------------------------

def batch_invert(api, values):
    """Invert many values with ONE hint (reference
    constraint/blueprint_batch_inverse.go): each inverse is certified
    by v * inv == 1 (so zero values make the circuit unsatisfiable)."""
    from gnark_tpu.constraint.hints import HINTS, register_hint
    if "batch_inv" not in HINTS:
        @register_hint("batch_inv")
        def _batch_inv(q, ins):
            return [pow(v % q, -1, q) if v % q else 0 for v in ins]
    outs = api.new_hint("batch_inv", len(values), *values)
    for v, iv in zip(values, outs):
        api.assert_is_equal(api.mul(v, iv), 1)
    return outs
