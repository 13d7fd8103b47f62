"""In-circuit Fiat-Shamir transcript (reference std/fiat-shamir).

Challenges are derived in a fixed registration order; each challenge
hashes (with a circuit hash gadget, MiMC by default) the challenge
name, the previous challenge, and all data bound to it — the in-circuit
mirror of backend/transcript.py for recursion verifiers.
"""

from __future__ import annotations

from gnark_tpu.std.hash.mimc import MiMCGadget


class Transcript:
    def __init__(self, api, names: list[str], hash_factory=None):
        self.api = api
        self.names = list(names)
        self._factory = hash_factory or (lambda: MiMCGadget(api))
        self._data: dict[str, list] = {n: [] for n in names}
        self._value: dict[str, object] = {}
        self._done: list[str] = []

    def bind(self, name: str, *values) -> None:
        assert name in self._data and name not in self._value, name
        self._data[name].extend(values)

    def compute_challenge(self, name: str):
        assert name not in self._value, f"challenge {name} already derived"
        idx = self.names.index(name)
        assert len(self._done) == idx, \
            f"challenges must be derived in order {self.names}"
        h = self._factory()
        # bind the name as a constant field element
        h.write(int.from_bytes(name.encode(), "big"))
        if self._done:
            h.write(self._value[self._done[-1]])
        for v in self._data[name]:
            h.write(v)
        c = h.sum()
        self._value[name] = c
        self._done.append(name)
        return c
