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
