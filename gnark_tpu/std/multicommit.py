"""Multicommit: multiplex many randomness requests onto one commitment
(reference std/multicommit/nativecommit.go).

Gadgets that each need an independent challenge share a single
api.commit: the first challenge is the commitment itself, subsequent
ones are successive powers (each is still unpredictable before the
commitment is fixed).
"""

from __future__ import annotations


class _State:
    def __init__(self):
        self.vars = []
        self.callbacks = []
        self.registered = False


_KEY = "_gnark_tpu_multicommit"


def _state(api) -> _State:
    st = getattr(api, _KEY, None)
    if st is None:
        st = _State()
        setattr(api, _KEY, st)
    return st


def with_commitment(api, callback, *values) -> None:
    """Register values to commit and a callback(api, challenge) run at
    finalization with a challenge bound to ALL registered values."""
    st = _state(api)
    st.vars.extend(values)
    st.callbacks.append(callback)
    if not st.registered:
        st.registered = True
        api.defer_(_finalize)


def _finalize(api) -> None:
    st = _state(api)
    if not st.callbacks:
        return
    base = api.commit(*st.vars) if st.vars else api.commit(0)
    ch = base
    for cb in st.callbacks:
        cb(api, ch)
        ch = api.mul(ch, base)
