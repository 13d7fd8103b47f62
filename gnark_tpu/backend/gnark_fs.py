"""gnark-bit-exact Fiat-Shamir transcript + hash-to-field + marshals.

Replicates the byte conventions of gnark-crypto as consumed by the
reference backends, so challenges (and therefore proofs) are
cross-verifiable with gnark:

  * fiat-shamir.Transcript: challenge bytes =
        H(challengeID_utf8 || previous_challenge_digest || bindings)
    where H resets between challenges, the previous challenge chains
    as its RAW digest (not reduced mod r), and the first challenge
    has no previous (reference usage:
    backend/plonk/bn254/prove.go:217, verify.go:88-125).
  * fr elements bind/Marshal as 32-byte (fr.Bytes) big-endian.
  * G1/G2 points bind as gnark-crypto Marshal() == RawBytes()
    (UNCOMPRESSED): X||Y big-endian full-width; Fp2 coords as A1||A0;
    infinity = flag byte 0b01<<6 (gnark-style curves) or 0x40 (zcash
    style, BLS12-381) + zeros.
  * challenge value = SetBytes(digest) = digest interpreted big-endian
    mod r.
  * fr/hash_to_field: RFC 9380 expand_message_xmd(SHA-256, msg, dst,
    L=(bits+128+7)//8) per element, reduced mod r
    (dst "BSB22-Plonk" for PLONK BSB22 values,
    backend/plonk/bn254/prove.go:206-207,305-312;
    "bsb22-commitment" for Groth16, constraint/commitment.go:7 +
    backend/groth16/bn254/prove.go:57-58,87-96;
    "G16-BSB22" for the Groth16 PoK folding challenge,
    prove.go:119-124).
  * kzg.BatchOpenSinglePoint folding challenge (deriveGamma):
    one-challenge transcript "gamma" binding point.Marshal(),
    digests[i].Marshal() (uncompressed), claimedValues[i].Marshal(),
    then extra transcript data (the plonk prover appends
    ZShiftedOpening.ClaimedValue.Marshal(), prove.go:828-836).

No gnark-generated proof fixture exists in this environment (the
reference repo checks in VKs only), so bit-parity is pinned by
hand-derived vectors in tests/test_gnark_fs.py that recompute each
challenge from the raw spec above, plus the cross-checked point/VK
serialization in io/gnark.py.
"""

from __future__ import annotations

import hashlib

from gnark_tpu.utils.hash_to_field import hash_to_field as _htf

GROTH16_COMMITMENT_DST = b"bsb22-commitment"
GROTH16_FOLD_DST = b"G16-BSB22"
PLONK_COMMITMENT_DST = b"BSB22-Plonk"


class GnarkTranscript:
    """gnark-crypto fiat-shamir.Transcript (default hash sha256)."""

    def __init__(self, q: int, names: list[str], hash_factory=None):
        self.q = q
        self.nbytes = -(-q.bit_length() // 8)
        self.names = list(names)
        self._h = hash_factory or hashlib.sha256
        self._bindings: dict[str, bytearray] = {
            n: bytearray() for n in names}
        self._digest: dict[str, bytes] = {}
        self._done: list[str] = []

    # -- binding helpers (gnark-crypto Marshal conventions) -------------

    def fe_bytes(self, v: int) -> bytes:
        return (v % self.q).to_bytes(self.nbytes, "big")

    def bind(self, name: str, data: bytes) -> None:
        assert name in self._bindings and name not in self._digest, name
        self._bindings[name] += data

    def challenge(self, name: str) -> int:
        """Compute the named challenge; must be called in declaration
        order. Returns digest mod q (fr.SetBytes semantics)."""
        assert name not in self._digest, name
        idx = self.names.index(name)
        assert len(self._done) == idx, \
            f"challenges must be derived in order: {self.names}"
        h = self._h()
        h.update(name.encode())
        if self._done:
            h.update(self._digest[self._done[-1]])
        h.update(bytes(self._bindings[name]))
        d = h.digest()
        self._digest[name] = d
        self._done.append(name)
        return int.from_bytes(d, "big") % self.q


# -- point marshals (gnark-crypto RawBytes, uncompressed) -----------------

def _zcash_style(curve_name: str) -> bool:
    return curve_name == "bls12_381"


def g1_raw_bytes(curve, P) -> bytes:
    """gnark-crypto G1Affine.Marshal()/RawBytes(): uncompressed."""
    nb = -(-curve.fp.modulus.bit_length() // 8)
    if P is None:
        hdr = 0x40 if _zcash_style(curve.name) else (0b01 << 6)
        return bytes([hdr]) + b"\x00" * (2 * nb - 1)
    x, y = P
    return x.to_bytes(nb, "big") + y.to_bytes(nb, "big")


def g2_raw_bytes(curve, P) -> bytes:
    """gnark-crypto G2Affine.Marshal(): uncompressed, Fp2 as A1||A0."""
    nb = -(-curve.fp.modulus.bit_length() // 8)
    if P is None:
        hdr = 0x40 if _zcash_style(curve.name) else (0b01 << 6)
        return bytes([hdr]) + b"\x00" * (4 * nb - 1)
    (x0, x1), (y0, y1) = P
    return (x1.to_bytes(nb, "big") + x0.to_bytes(nb, "big")
            + y1.to_bytes(nb, "big") + y0.to_bytes(nb, "big"))


# -- fr hash_to_field ------------------------------------------------------

def hash_to_fr(msg: bytes, dst: bytes, q: int) -> int:
    """gnark-crypto fr.Hash(msg, dst, 1)[0]."""
    return _htf(msg, dst, 1, q)[0]


def bsb22_groth16_value(curve, commitment, public_committed: list[int],
                        q: int) -> int:
    """Groth16 BSB22 commitment wire value
    (backend/groth16/bn254/prove.go:87-96 +
    constraint.SerializeCommitment)."""
    nb = -(-q.bit_length() // 8)
    msg = g1_raw_bytes(curve, commitment) + b"".join(
        (v % q).to_bytes(nb, "big") for v in public_committed)
    return hash_to_fr(msg, GROTH16_COMMITMENT_DST, q)


def bsb22_plonk_value(curve, commitment, q: int) -> int:
    """PLONK BSB22 commitment value (prove.go:305-312)."""
    return hash_to_fr(g1_raw_bytes(curve, commitment),
                      PLONK_COMMITMENT_DST, q)


def groth16_fold_challenge(commitment_values: list[int], q: int) -> int:
    """PoK folding challenge (prove.go:118-124): fr.Hash over the
    concatenated commitment WIRE values, dst G16-BSB22."""
    nb = -(-q.bit_length() // 8)
    msg = b"".join((v % q).to_bytes(nb, "big")
                   for v in commitment_values)
    return hash_to_fr(msg, GROTH16_FOLD_DST, q)


def kzg_fold_challenge(curve, q: int, point: int, digests, claimed,
                       extra: bytes = b"", hash_factory=None) -> int:
    """gnark-crypto kzg deriveGamma (BatchOpenSinglePoint /
    FoldProof): single-challenge transcript "gamma"."""
    ts = GnarkTranscript(q, ["gamma"], hash_factory)
    ts.bind("gamma", ts.fe_bytes(point))
    for d in digests:
        ts.bind("gamma", g1_raw_bytes(curve, d))
    for v in claimed:
        ts.bind("gamma", ts.fe_bytes(v))
    if extra:
        ts.bind("gamma", extra)
    return ts.challenge("gamma")
