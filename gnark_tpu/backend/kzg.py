"""KZG polynomial commitments.

TPU analog of gnark-crypto's `kzg` package (the reference imports it
38x; PLONK's entire commitment layer — SURVEY.md §2.1). Commit/Open are
device MSMs over the SRS; Verify is a host pairing check.

  SRS:     [g1, tau*g1, tau^2*g1, ...], [g2, tau*g2]
  Commit:  C = sum_i p_i * [tau^i]g1                      (device MSM)
  Open:    quotient q(x) = (p(x) - p(z)) / (x - z), proof = Commit(q)
  Verify:  e(C - [p(z)]g1, g2) == e(proof, [tau]g2 - [z]g2)
  Batch:   fold polynomials with a challenge before opening
           (gnark-crypto BatchOpenSinglePoint semantics)
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from gnark_tpu.ec import curves as curves_mod
from gnark_tpu.ec import host
from gnark_tpu.ec.weierstrass import jac_to_affine
from gnark_tpu.ff import get_ff
from gnark_tpu.msm import msm
from gnark_tpu.msm.fixed_base import batch_scalar_mul
from gnark_tpu.pairing import get_pairing


@dataclasses.dataclass
class SRS:
    curve: curves_mod.Curve
    g1_powers: tuple       # device affine (x, y, inf), length n
    g1_host: list          # host copies (for verify-side small ops)
    g2_gen: tuple          # host G2 affine
    g2_tau: tuple          # host G2 affine


def setup_srs(curve_name: str, size: int, tau: int | None = None,
              rng=None, with_host: bool = True) -> SRS:
    """Insecure single-party SRS (reference test/unsafekzg analog).

    with_host=False skips the O(size) device->host point decode
    (g1_host=[]) — commits only need the device powers; use for
    benchmarks/prover-only setups."""
    import secrets
    curve = curves_mod.CURVES[curve_name]
    q = curve.fr.modulus
    if tau is None:
        tau = (rng.randrange(q) if rng else secrets.randbelow(q)) or 1
    ffp = get_ff(curve.fp.name)
    ffr = get_ff(curve.fr.name)
    powers = []
    acc = 1
    for _ in range(size):
        powers.append(acc)
        acc = acc * tau % q
    base = (jnp.asarray(ffp.encode(curve.g1[0])),
            jnp.asarray(ffp.encode(curve.g1[1])))
    pts_dev = jac_to_affine(ffp, batch_scalar_mul(
        ffp, base, curve.fr.bits, jnp.asarray(ffr.encode(powers, mont=False))))
    from gnark_tpu.backend.groth16 import _decode_affine
    pts_host = _decode_affine(ffp, pts_dev) if with_host else []
    f2 = curve.host_g2_field
    return SRS(curve=curve, g1_powers=pts_dev, g1_host=pts_host,
               g2_gen=curve.g2, g2_tau=host.ec_mul(f2, curve.g2, tau))


def commit_device(srs: SRS, coeffs_plain) -> tuple:
    """Commit to a polynomial given PLAIN-limb device coeffs (n, K).
    Returns a device Jacobian point."""
    n = coeffs_plain.shape[0]
    pts = tuple(a[:n] for a in srs.g1_powers)
    return msm(get_ff(srs.curve.fp.name), pts, coeffs_plain,
               srs.curve.fr.bits)


def commit(srs: SRS, coeffs: list) -> tuple:
    """Commit to host int coefficients; returns a host affine point."""
    ffp = get_ff(srs.curve.fp.name)
    ffr = get_ff(srs.curve.fr.name)
    dev = jnp.asarray(ffr.encode(coeffs, mont=False))
    from gnark_tpu.backend.groth16 import _decode_affine, _tup1
    R = commit_device(srs, dev)
    return _decode_affine(ffp, jac_to_affine(ffp, _tup1(R)))[0]


def _poly_eval(coeffs, z, q):
    r = 0
    for c in reversed(coeffs):
        r = (r * z + c) % q
    return r


def _synthetic_div(coeffs, z, q):
    """(p(x) - p(z)) / (x - z) via Horner; returns quotient coeffs."""
    n = len(coeffs)
    out = [0] * (n - 1)
    acc = 0
    for i in range(n - 1, 0, -1):
        acc = (acc * z + coeffs[i]) % q
        out[i - 1] = acc
    return out


@dataclasses.dataclass
class OpeningProof:
    h: tuple               # commitment to quotient (host affine)
    claimed_value: int


def open_at(srs: SRS, coeffs: list, z: int) -> OpeningProof:
    q = srs.curve.fr.modulus
    v = _poly_eval(coeffs, z, q)
    quot = _synthetic_div(coeffs, z, q)
    if not quot:
        quot = [0]
    return OpeningProof(h=commit(srs, quot), claimed_value=v)


def verify_opening(srs: SRS, commitment, proof: OpeningProof, z: int) -> bool:
    """e(C - v*g1 + z*H, g2) == e(H, tau*g2)  (gnark-crypto kzg.Verify
    algebra, rearranged to two Miller loops + one final exp)."""
    curve = srs.curve
    q = curve.fr.modulus
    f1 = curve.host_fp
    f2 = curve.host_g2_field
    # lhs point: C - v*G1 + z*H
    p = host.ec_add(f1, commitment,
                    host.ec_neg(f1, host.ec_mul(f1, curve.g1,
                                                proof.claimed_value % q)))
    p = host.ec_add(f1, p, host.ec_mul(f1, proof.h, z % q))
    pairing = get_pairing(curve.name)
    res = pairing.pairing_product([
        (p, srs.g2_gen),
        (host.ec_neg(f1, proof.h), srs.g2_tau),
    ])
    return pairing.ext.eq(res, pairing.ext.one)


@dataclasses.dataclass
class BatchOpeningProof:
    h: tuple
    claimed_values: list


def batch_open_single_point(srs: SRS, polys: list, z: int,
                            challenge: int) -> BatchOpeningProof:
    """Fold polys with powers of `challenge`, open the fold at z
    (gnark-crypto kzg.BatchOpenSinglePoint shape)."""
    q = srs.curve.fr.modulus
    values = [_poly_eval(p, z, q) for p in polys]
    m = max(len(p) for p in polys)
    folded = [0] * m
    ch = 1
    for p in polys:
        for i, c in enumerate(p):
            folded[i] = (folded[i] + ch * c) % q
        ch = ch * challenge % q
    quot = _synthetic_div(folded, z, q) or [0]
    return BatchOpeningProof(h=commit(srs, quot), claimed_values=values)


def batch_verify_single_point(srs: SRS, commitments: list,
                              proof: BatchOpeningProof, z: int,
                              challenge: int) -> bool:
    curve = srs.curve
    q = curve.fr.modulus
    f1 = curve.host_fp
    folded_c = host.INF
    folded_v = 0
    ch = 1
    for c, v in zip(commitments, proof.claimed_values):
        folded_c = host.ec_add(f1, folded_c, host.ec_mul(f1, c, ch))
        folded_v = (folded_v + ch * v) % q
        ch = ch * challenge % q
    return verify_opening(
        srs, folded_c, OpeningProof(h=proof.h, claimed_value=folded_v), z)
