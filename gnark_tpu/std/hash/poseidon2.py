"""Poseidon2 permutation + hash: host implementation and circuit gadget.

Analog of the reference's std/permutation/poseidon2 + std/hash/poseidon2
(gnark-crypto fr/poseidon2 backend). Structure follows the Poseidon2
paper (Grassi-Khovratovich-Schofnegger 2023):

  * width t = 3, sbox x^5, RF = 8 external rounds (4+4), RP = 56
    internal rounds (BN254-class parameters)
  * external matrix  M_E = circ(2,1,1)
  * internal matrix  M_I = I + diag(0,0,1) + all-ones = [[2,1,1],[1,2,1],[1,1,3]]
  * round constants derived from a legacy-Keccak-256 chain seeded with
    b"poseidon2" (documented derivation; gnark-crypto bit-compat is a
    vector-level interop task — the construction is self-consistent and
    differentially tested host vs gadget)

Hash: sponge with rate 2, capacity 1 (zero IV, 10* padding-free fixed-
length absorption like gnark's poseidon2 hash of field elements).
"""

from __future__ import annotations

import functools

from gnark_tpu import fields
from gnark_tpu.utils.keccak import keccak256

T = 3
RF = 8
RP = 56
SEED = b"poseidon2"


@functools.lru_cache(maxsize=None)
def round_constants(field_name: str):
    """(RF + RP) rounds; external rounds use T constants, internal 1."""
    q = fields.FIELDS[field_name].modulus
    rnd = keccak256(SEED + field_name.encode())
    out = []
    for _ in range(RF * T + RP):
        rnd = keccak256(rnd)
        out.append(int.from_bytes(rnd, "big") % q)
    return out


def _split_constants(field_name):
    cs = round_constants(field_name)
    half = RF // 2
    ext1 = [cs[r * T:(r + 1) * T] for r in range(half)]
    off = half * T
    internal = cs[off:off + RP]
    off += RP
    ext2 = [cs[off + r * T: off + (r + 1) * T] for r in range(half)]
    return ext1, internal, ext2


class Poseidon2:
    """Host permutation/hash over python ints."""

    def __init__(self, field_name: str = "bn254_fr"):
        self.q = fields.FIELDS[field_name].modulus
        self.ext1, self.internal, self.ext2 = _split_constants(field_name)

    def _sbox(self, x):
        q = self.q
        x2 = x * x % q
        return x2 * x2 % q * x % q

    def _mat_ext(self, s):
        q = self.q
        tot = sum(s) % q
        return [(x + tot) % q for x in s]

    def _mat_int(self, s):
        q = self.q
        tot = sum(s) % q
        return [(s[0] + tot) % q, (s[1] + tot) % q, (2 * s[2] + tot) % q]

    def permute(self, state):
        q = self.q
        s = [x % q for x in state]
        s = self._mat_ext(s)                      # pre-mixing (paper)
        for rc in self.ext1:
            s = [self._sbox((x + c) % q) for x, c in zip(s, rc)]
            s = self._mat_ext(s)
        for c in self.internal:
            s[0] = self._sbox((s[0] + c) % q)
            s = self._mat_int(s)
        for rc in self.ext2:
            s = [self._sbox((x + c) % q) for x, c in zip(s, rc)]
            s = self._mat_ext(s)
        return s

    def hash(self, values) -> int:
        """Sponge, rate 2 / capacity 1."""
        s = [0, 0, 0]
        vals = list(values)
        for i in range(0, len(vals), 2):
            s[0] = (s[0] + vals[i]) % self.q
            if i + 1 < len(vals):
                s[1] = (s[1] + vals[i + 1]) % self.q
            s = self.permute(s)
        return s[0]


class Poseidon2Gadget:
    """In-circuit Poseidon2 (same algebra over api variables)."""

    def __init__(self, api, field_name: str = "bn254_fr"):
        self.api = api
        self.ext1, self.internal, self.ext2 = _split_constants(field_name)

    def _sbox(self, x):
        api = self.api
        x2 = api.mul(x, x)
        x4 = api.mul(x2, x2)
        return api.mul(x4, x)

    def _mat_ext(self, s):
        api = self.api
        tot = api.add(s[0], s[1], s[2])
        return [api.add(x, tot) for x in s]

    def _mat_int(self, s):
        api = self.api
        tot = api.add(s[0], s[1], s[2])
        return [api.add(s[0], tot), api.add(s[1], tot),
                api.add(api.mul(2, s[2]), tot)]

    def permute(self, state):
        api = self.api
        s = list(state)
        s = self._mat_ext(s)
        for rc in self.ext1:
            s = [self._sbox(api.add(x, c)) for x, c in zip(s, rc)]
            s = self._mat_ext(s)
        for c in self.internal:
            s[0] = self._sbox(api.add(s[0], c))
            s = self._mat_int(s)
        for rc in self.ext2:
            s = [self._sbox(api.add(x, c)) for x, c in zip(s, rc)]
            s = self._mat_ext(s)
        return s

    def hash(self, values):
        api = self.api
        s = [0, 0, 0]
        vals = list(values)
        for i in range(0, len(vals), 2):
            s[0] = api.add(s[0], vals[i])
            if i + 1 < len(vals):
                s[1] = api.add(s[1], vals[i + 1])
            s = self.permute(s)
        return s[0]
