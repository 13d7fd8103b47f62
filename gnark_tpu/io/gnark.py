"""Readers/writers for gnark's BINARY key formats — the interop gate.

Wire format (reverse-engineered from gnark-crypto's Encoder and
validated against gnark-generated fixtures checked into
tests/data/gnark_fixtures/, sourced from the reference repo's
backend/solidity/testdata):

- G1 point, compressed: ceil(fp_bits/8) big-endian bytes of X with the
  top two bits of byte 0 as flags — 0b10 compressed/y-smallest,
  0b11 compressed/y-largest, 0b01 infinity (zero body),
  0b00 uncompressed (X then Y, full width).
- G2 point: same flags, body = X.A1 then X.A0 (each coordinate-width).
  "Largest" for Fp2 compares A1 first, then A0 (gnark-crypto
  E2.LexicographicallyLargest).
- fr/fp scalars: full-width big-endian; uint32/uint64: big-endian.
- slices: uint32 length prefix, then elements.

Groth16 VerifyingKey layout (backend/groth16/bn254/marshal.go:103-146):
  G1.Alpha, G1.Beta, G2.Beta, G2.Gamma, G1.Delta, G2.Delta,
  []G1 K, [][]uint64 PublicAndCommitmentCommitted,
  uint32 nbCommitmentKeys, then pedersen VKs (G2 g, G2 gRootSigmaNeg).

PLONK VerifyingKey layout (backend/plonk/bn254/marshal.go:177-212):
  uint64 0 (version marker), uint64 version, uint64 Size, fr SizeInv,
  fr Generator, uint64 NbPublicVariables, fr CosetShift, S[0..2],
  Ql, Qr, Qm, Qo, Qk (G1 each), []G1 Qcp, Kzg.G1, Kzg.G2[0], Kzg.G2[1],
  Kzg.Lines (skipped — precomputed pairing lines), []uint64
  CommitmentConstraintIndexes (read from the tail).
"""

from __future__ import annotations

import dataclasses

from gnark_tpu.ec.curves import CURVES
from gnark_tpu.ec.host import INF, Fp, Fp2, validate_points


def _coord_bytes(curve) -> int:
    return -(-curve.fp.modulus.bit_length() // 8)


def _lex_largest_fp(p: int, y: int) -> bool:
    return y > (p - 1) // 2


def _lex_largest_fp2(p: int, y) -> bool:
    if y[1] != 0:
        return _lex_largest_fp(p, y[1])
    return _lex_largest_fp(p, y[0])


def _zcash_style(curve_name: str) -> bool:
    """BLS12-381 uses the ZCash serialization (0x80 compressed, 0x40
    infinity, 0x20 y-largest); other curves use gnark-crypto's 2-bit
    scheme."""
    return curve_name == "bls12_381"


class GnarkReader:
    def __init__(self, curve_name: str, data: bytes):
        self.curve = CURVES[curve_name]
        self.p = self.curve.fp.modulus
        self.f1 = Fp(self.p)
        self.f2 = self.curve.host_g2_field
        self.nb = _coord_bytes(self.curve)
        self.zc = _zcash_style(curve_name)
        self.d = data
        self.i = 0

    def _flags(self, b0: int):
        """-> (kind, largest, xmask) with kind in
        {'inf', 'comp', 'uncomp'}."""
        if self.zc:
            comp = b0 & 0x80
            inf = b0 & 0x40
            largest = bool(b0 & 0x20)
            if inf:
                return "inf", False, 0x1F
            return ("comp" if comp else "uncomp"), largest, 0x1F
        flag = b0 >> 6
        if flag == 0b01:
            return "inf", False, 0x3F
        if flag == 0b00:
            return "uncomp", False, 0x3F
        return "comp", flag == 0b11, 0x3F

    def take(self, n: int) -> bytes:
        b = self.d[self.i:self.i + n]
        if len(b) != n:
            raise ValueError("gnark stream truncated")
        self.i += n
        return b

    def u32(self) -> int:
        return int.from_bytes(self.take(4), "big")

    def u64(self) -> int:
        return int.from_bytes(self.take(8), "big")

    def fr(self) -> int:
        nb = -(-self.curve.fr.modulus.bit_length() // 8)
        return int.from_bytes(self.take(nb), "big")

    def g1(self):
        b = self.take(self.nb)
        kind, largest, xmask = self._flags(b[0])
        x = int.from_bytes(bytes([b[0] & xmask]) + b[1:], "big")
        if kind == "inf":
            if x:
                raise ValueError("nonzero infinity body")
            return INF
        if kind == "uncomp":
            y = int.from_bytes(self.take(self.nb), "big")
            return (x, y)
        if x >= self.p:
            raise ValueError("G1 x out of range")
        rhs = (pow(x, 3, self.p) + self.curve.b) % self.p
        y = self.f1.sqrt(rhs)
        if y is None or y * y % self.p != rhs:
            raise ValueError("G1 x not on curve")
        if _lex_largest_fp(self.p, y) != largest:
            y = self.p - y
        return (x, y)

    def g2(self):
        b = self.take(2 * self.nb)
        kind, largest, xmask = self._flags(b[0])
        a1 = int.from_bytes(bytes([b[0] & xmask]) + b[1:self.nb], "big")
        a0 = int.from_bytes(b[self.nb:], "big")
        if kind == "inf":
            if a0 or a1:
                raise ValueError("nonzero infinity body")
            return INF
        if kind == "uncomp":
            yb = self.take(2 * self.nb)
            y1 = int.from_bytes(yb[:self.nb], "big")
            y0 = int.from_bytes(yb[self.nb:], "big")
            return ((a0, a1), (y0, y1))
        x = (a0, a1)
        f2 = self.f2
        b2 = tuple(self.curve.b2)
        rhs = f2.add(f2.mul(f2.mul(x, x), x), b2)
        y = f2.sqrt(rhs)
        if y is None or not f2.eq(f2.mul(y, y), rhs):
            raise ValueError("G2 x not on curve")
        if _lex_largest_fp2(self.p, y) != largest:
            y = f2.neg(y)
        return (x, y)

    def g1_slice(self):
        n = self.u32()
        return [self.g1() for _ in range(n)]

    def u64_slice(self):
        n = self.u32()
        return [self.u64() for _ in range(n)]

    def u64_slice_slice(self):
        n = self.u32()
        return [self.u64_slice() for _ in range(n)]


@dataclasses.dataclass
class GnarkGroth16Vk:
    curve_name: str
    g1_alpha: tuple
    g1_beta: tuple
    g2_beta: tuple
    g2_gamma: tuple
    g1_delta: tuple
    g2_delta: tuple
    g1_k: list
    public_and_commitment_committed: list
    commitment_keys: list        # [(g2 g, g2 gRootSigmaNeg)]


def read_groth16_vk(curve_name: str, data: bytes) -> GnarkGroth16Vk:
    r = GnarkReader(curve_name, data)
    alpha = r.g1()
    beta1 = r.g1()
    beta2 = r.g2()
    gamma2 = r.g2()
    delta1 = r.g1()
    delta2 = r.g2()
    k = r.g1_slice()
    pcc = r.u64_slice_slice()
    nbc = r.u32()
    cks = []
    for _ in range(nbc):
        cks.append((r.g2(), r.g2()))
    if r.i != len(data):
        raise ValueError(f"{len(data) - r.i} trailing bytes")
    vk = GnarkGroth16Vk(curve_name, alpha, beta1, beta2, gamma2,
                        delta1, delta2, k, pcc, cks)
    pts1 = [p for p in [alpha, beta1, delta1] + k if p is not INF]
    pts2 = [p for p in [beta2, gamma2, delta2] if p is not INF]
    for g, srs in cks:
        pts2 += [g, srs]
    if not validate_points(CURVES[curve_name], g1_points=pts1,
                           g2_points=pts2):
        raise ValueError("gnark vk: point validation failed")
    return vk


@dataclasses.dataclass
class GnarkPlonkVk:
    curve_name: str
    size: int
    size_inv: int
    generator: int
    nb_public: int
    coset_shift: int
    s: list                      # 3 G1
    ql: tuple
    qr: tuple
    qm: tuple
    qo: tuple
    qk: tuple
    qcp: list
    kzg_g1: tuple
    kzg_g2: list                 # [g2 gen, g2 tau]
    commitment_indexes: list


def read_plonk_vk(curve_name: str, data: bytes) -> GnarkPlonkVk:
    r = GnarkReader(curve_name, data)
    first = r.u64()
    if first == 0:                 # versioned stream: marker, version
        r.u64()
        size = r.u64()
    else:                          # legacy stream: starts at Size
        size = first
    size_inv = r.fr()
    generator = r.fr()
    nb_public = r.u64()
    coset_shift = r.fr()
    s = [r.g1() for _ in range(3)]
    ql, qr, qm, qo, qk = (r.g1() for _ in range(5))
    qcp = r.g1_slice()
    kzg_g1 = r.g1()
    kzg_g2 = [r.g2(), r.g2()]
    # Kzg.Lines: precomputed Miller lines — opaque blob; the
    # CommitmentConstraintIndexes u64-slice sits at the very end, so
    # parse it from the tail and skip the middle.
    tail = data[r.i:]
    # try suffix lengths: indexes slice is 4 + 8*n bytes
    idxs = None
    for n in range(0, 64):
        ln = 4 + 8 * n
        if ln > len(tail):
            break
        cand = tail[len(tail) - ln:]
        if int.from_bytes(cand[:4], "big") == n:
            vals = [int.from_bytes(cand[4 + 8 * i:12 + 8 * i], "big")
                    for i in range(n)]
            if all(v < size for v in vals):
                idxs = vals
                break
    if idxs is None:
        raise ValueError("could not locate CommitmentConstraintIndexes")
    vk = GnarkPlonkVk(curve_name, size, size_inv, generator, nb_public,
                      coset_shift, s, ql, qr, qm, qo, qk, qcp, kzg_g1,
                      kzg_g2, idxs)
    q = CURVES[curve_name].fr.modulus
    if size_inv != pow(size, -1, q):
        raise ValueError("SizeInv mismatch")
    if pow(generator, size, q) != 1 or pow(generator, size // 2, q) == 1:
        raise ValueError("Generator is not a primitive size-th root")
    pts1 = [p for p in s + [ql, qr, qm, qo, qk, kzg_g1] + qcp
            if p is not INF]
    if not validate_points(CURVES[curve_name], g1_points=pts1,
                           g2_points=kzg_g2):
        raise ValueError("gnark plonk vk: point validation failed")
    return vk


# -- writers (round-trip + export of OUR keys in gnark's format) -------------

def _write_g1(curve, P) -> bytes:
    nb = _coord_bytes(curve)
    p = curve.fp.modulus
    zc = _zcash_style(curve.name)
    if P is INF:
        hdr = (0x80 | 0x40) if zc else (0b01 << 6)
        return bytes([hdr]) + b"\x00" * (nb - 1)
    x, y = P
    b = bytearray(x.to_bytes(nb, "big"))
    if zc:
        b[0] |= 0x80 | (0x20 if _lex_largest_fp(p, y) else 0)
    else:
        b[0] |= (0b11 if _lex_largest_fp(p, y) else 0b10) << 6
    return bytes(b)


def _write_g2(curve, P) -> bytes:
    nb = _coord_bytes(curve)
    p = curve.fp.modulus
    zc = _zcash_style(curve.name)
    if P is INF:
        hdr = (0x80 | 0x40) if zc else (0b01 << 6)
        return bytes([hdr]) + b"\x00" * (2 * nb - 1)
    (x0, x1), y = P
    b = bytearray(x1.to_bytes(nb, "big") + x0.to_bytes(nb, "big"))
    if zc:
        b[0] |= 0x80 | (0x20 if _lex_largest_fp2(p, y) else 0)
    else:
        b[0] |= (0b11 if _lex_largest_fp2(p, y) else 0b10) << 6
    return bytes(b)


def write_groth16_vk(vk) -> bytes:
    """Serialize OUR backend.groth16.VerifyingKey in gnark's binary
    layout (G1.Beta is not kept in our vk: emitted as infinity; gnark's
    verifier does not use it)."""
    c = vk.curve
    out = b""
    out += _write_g1(c, vk.g1_alpha)
    out += _write_g1(c, getattr(vk, "g1_beta", None) or INF)
    out += _write_g2(c, vk.g2_beta)
    out += _write_g2(c, vk.g2_gamma)
    out += _write_g1(c, getattr(vk, "g1_delta", None) or INF)
    out += _write_g2(c, vk.g2_delta)
    out += len(vk.g1_k).to_bytes(4, "big")
    for P in vk.g1_k:
        out += _write_g1(c, P)
    pcc = getattr(vk, "public_and_commitment_committed", None) or []
    out += len(pcc).to_bytes(4, "big")
    for row in pcc:
        out += len(row).to_bytes(4, "big")
        for v in row:
            out += int(v).to_bytes(8, "big")
    sig = vk.commitment_g2_sigma or []
    out += len(sig).to_bytes(4, "big")
    for entry in sig:
        g, srs = entry if isinstance(entry, tuple) and len(entry) == 2 \
            else (entry, entry)
        out += _write_g2(c, g) + _write_g2(c, srs)
    return out


# -- proofs ------------------------------------------------------------------

def write_groth16_proof(proof, curve_name: str) -> bytes:
    """Serialize our backend Groth16 Proof in gnark's binary layout
    (backend/groth16/bn254/marshal.go:33-58: Ar | Bs | Krs |
    []Commitments | CommitmentPok). gnark stores ONE folded PoK; the
    default prover folds the same way (G16-BSB22 challenge), so every
    non-recursion proof serializes; recursion_friendly proofs keep
    per-commitment PoKs and raise here."""
    c = CURVES[curve_name]
    if len(proof.poks) > 1:
        raise NotImplementedError(
            "per-commitment PoKs (recursion_friendly proof); gnark "
            "stores one folded PoK")
    out = _write_g1(c, proof.ar)
    out += _write_g2(c, proof.bs)
    out += _write_g1(c, proof.krs)
    out += len(proof.commitments).to_bytes(4, "big")
    for P in proof.commitments:
        out += _write_g1(c, P)
    pok = proof.poks[0] if proof.poks else INF
    out += _write_g1(c, pok)
    return out


def read_groth16_proof(curve_name: str, data: bytes):
    """-> backend.groth16.Proof (validated points)."""
    from gnark_tpu.backend.groth16 import Proof
    r = GnarkReader(curve_name, data)
    ar = r.g1()
    bs = r.g2()
    krs = r.g1()
    cms = r.g1_slice()
    pok = r.g1()
    if r.i != len(data):
        raise ValueError(f"{len(data) - r.i} trailing bytes")
    pts1 = [p for p in [ar, krs, pok] + cms if p is not INF]
    if not validate_points(CURVES[curve_name], g1_points=pts1,
                           g2_points=[bs]):
        raise ValueError("gnark proof: point validation failed")
    return Proof(ar=ar, krs=krs, bs=bs, commitments=cms,
                 poks=[pok] if cms else [])


def write_plonk_proof(proof, curve_name: str) -> bytes:
    """Serialize our PlonkProof in gnark's layout
    (backend/plonk/bn254/marshal.go:28-50: LRO | Z | H[3] |
    BatchedProof.H | []ClaimedValues | ZShift.H | ZShift.Claimed |
    []Bsb22Commitments)."""
    c = CURVES[curve_name]
    nb = -(-c.fr.modulus.bit_length() // 8)
    out = b"".join(_write_g1(c, P) for P in proof.lro)
    out += _write_g1(c, proof.z)
    out += b"".join(_write_g1(c, P) for P in proof.h)
    out += _write_g1(c, proof.batched_h)
    out += len(proof.claimed).to_bytes(4, "big")
    for v in proof.claimed:
        out += int(v).to_bytes(nb, "big")
    out += _write_g1(c, proof.z_shift_h)
    out += int(proof.zu).to_bytes(nb, "big")
    out += len(proof.bsb22).to_bytes(4, "big")
    for P in proof.bsb22:
        out += _write_g1(c, P)
    return out


def read_plonk_proof(curve_name: str, data: bytes):
    """-> backend.plonk.PlonkProof (validated points)."""
    from gnark_tpu.backend.plonk import PlonkProof
    r = GnarkReader(curve_name, data)
    lro = [r.g1() for _ in range(3)]
    z = r.g1()
    h = [r.g1() for _ in range(3)]
    batched_h = r.g1()
    n = r.u32()
    claimed = [r.fr() for _ in range(n)]
    z_shift_h = r.g1()
    zu = r.fr()
    nb2 = r.u32()
    bsb22 = [r.g1() for _ in range(nb2)]
    if r.i != len(data):
        raise ValueError(f"{len(data) - r.i} trailing bytes")
    pts = [p for p in lro + [z] + h + [batched_h, z_shift_h] + bsb22
           if p is not INF]
    if not validate_points(CURVES[curve_name], g1_points=pts):
        raise ValueError("gnark plonk proof: point validation failed")
    return PlonkProof(lro=lro, z=z, h=h, batched_h=batched_h,
                      claimed=claimed, z_shift_h=z_shift_h, zu=zu,
                      bsb22=bsb22)
