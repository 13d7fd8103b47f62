"""MPC trusted setup, Phase 1 (powers of tau).

Analog of the reference's backend/groth16/<curve>/mpcsetup/phase1.go:
a chain of contributors, each multiplying fresh randomness (tau', a',
b') into the accumulated powers; every link and the final state are
verified with pairing same-ratio checks (VerifyPhase1,
phase1.go:172-222).

Phase 2 (circuit specialization via group-FFT Lagrange SRS +
delta contributions, phase2.go) is the follow-up stage; Phase 1 output
here already feeds kzg.SRS directly (PLONK needs exactly the tau
powers), so PLONK setups can consume a ceremony today.

Simplification vs the reference (documented): contribution proofs
publish ([s]1, [s]2) pairs and the chain check verifies
e(new, g2) == e(old, [s]2); the reference additionally hashes the
transcript to derive the PoK base (mpcsetup.UpdateProof). Transcript
binding is a security hardening TODO, the algebra is identical.
"""

from __future__ import annotations

import dataclasses
import secrets

from gnark_tpu.ec import curves as curves_mod
from gnark_tpu.ec import host
from gnark_tpu.pairing import get_pairing


@dataclasses.dataclass
class Phase1:
    curve: curves_mod.Curve
    n: int
    tau1: list       # [tau^i]_1, i = 0..2n-2
    tau2: list       # [tau^i]_2, i = 0..n-1
    alpha_tau1: list  # [alpha tau^i]_1, i < n
    beta_tau1: list   # [beta tau^i]_1, i < n
    beta2: tuple      # [beta]_2


@dataclasses.dataclass
class Contribution:
    tau_pub: tuple    # ([tau']_1, [tau']_2)
    alpha_pub: tuple  # ([alpha']_1, [alpha']_2)
    beta_pub: tuple   # ([beta']_1, [beta']_2)


def init_phase1(curve_name: str, n: int) -> Phase1:
    """Identity state (tau = alpha = beta = 1)."""
    curve = curves_mod.CURVES[curve_name]
    return Phase1(
        curve=curve, n=n,
        tau1=[curve.g1] * (2 * n - 1),
        tau2=[curve.g2] * n,
        alpha_tau1=[curve.g1] * n,
        beta_tau1=[curve.g1] * n,
        beta2=curve.g2,
    )


def contribute(state: Phase1, rng=None):
    """Mix fresh randomness in; returns (new_state, contribution)."""
    curve = state.curve
    q = curve.fr.modulus
    rnd = rng.randrange if rng else (lambda m: secrets.randbelow(m))
    tau = rnd(q) or 1
    alpha = rnd(q) or 1
    beta = rnd(q) or 1
    f1, f2 = curve.host_fp, curve.host_g2_field

    def scale_powers(points, base_scalar, extra=1):
        out = []
        acc = extra % q
        for p in points:
            out.append(host.ec_mul(f1, p, acc))
            acc = acc * base_scalar % q
        return out

    new = Phase1(
        curve=curve, n=state.n,
        tau1=scale_powers(state.tau1, tau),
        tau2=[host.ec_mul(f2, p, pow(tau, i, q))
              for i, p in enumerate(state.tau2)],
        alpha_tau1=scale_powers(state.alpha_tau1, tau, extra=alpha),
        beta_tau1=scale_powers(state.beta_tau1, tau, extra=beta),
        beta2=host.ec_mul(f2, state.beta2, beta),
    )
    proof = Contribution(
        tau_pub=(host.ec_mul(f1, curve.g1, tau),
                 host.ec_mul(f2, curve.g2, tau)),
        alpha_pub=(host.ec_mul(f1, curve.g1, alpha),
                   host.ec_mul(f2, curve.g2, alpha)),
        beta_pub=(host.ec_mul(f1, curve.g1, beta),
                  host.ec_mul(f2, curve.g2, beta)),
    )
    return new, proof


def _same_ratio(pairing, a1, b1, a2, b2) -> bool:
    """e(a1, b2) == e(b1, a2)  <=>  dlog(b1/a1) == dlog(b2/a2)."""
    f1 = pairing.fp
    return pairing.ext.eq(
        pairing.pairing_product([(a1, b2),
                                 (host.ec_neg(f1, b1), a2)]),
        pairing.gt_one())


def verify_link(prev: Phase1, new: Phase1, proof: Contribution) -> bool:
    """One contribution link + internal consistency of `new`."""
    curve = prev.curve
    pairing = get_pairing(curve.name)
    g2 = curve.g2

    # chain: e(new, g2) == e(prev, [tau']_2)
    if not _same_ratio(pairing, new.tau1[1], prev.tau1[1],
                       proof.tau_pub[1], g2):
        return False
    # published pair is itself consistent: e([t']1, g2) == e(g1, [t']2)
    for pub in (proof.tau_pub, proof.alpha_pub, proof.beta_pub):
        if not _same_ratio(pairing, curve.g1, pub[0], g2, pub[1]):
            return False
    # alpha/beta chain
    if not _same_ratio(pairing, new.alpha_tau1[0], prev.alpha_tau1[0],
                       proof.alpha_pub[1], g2):
        return False
    if not _same_ratio(pairing, new.beta_tau1[0], prev.beta_tau1[0],
                       proof.beta_pub[1], g2):
        return False
    return verify_consistency(new)


def verify_consistency(s: Phase1) -> bool:
    """Internal same-ratio structure of a Phase1 state
    (phase1.go VerifyPhase1 power checks)."""
    curve = s.curve
    pairing = get_pairing(curve.name)
    g2 = curve.g2
    t2_1 = s.tau2[1]
    # consecutive G1 powers share the ratio tau
    for i in range(len(s.tau1) - 1):
        if not _same_ratio(pairing, s.tau1[i + 1], s.tau1[i], t2_1, g2):
            return False
    # G2 powers match G1 powers
    for i in range(len(s.tau2)):
        if not _same_ratio(pairing, curve.g1, s.tau1[i], g2, s.tau2[i]):
            return False
    # alpha/beta rows share the tau ratio
    for i in range(len(s.alpha_tau1) - 1):
        if not _same_ratio(pairing, s.alpha_tau1[i + 1], s.alpha_tau1[i],
                           t2_1, g2):
            return False
    for i in range(len(s.beta_tau1) - 1):
        if not _same_ratio(pairing, s.beta_tau1[i + 1], s.beta_tau1[i],
                           t2_1, g2):
            return False
    # beta2 matches beta_tau1[0]
    return _same_ratio(pairing, curve.g1, s.beta_tau1[0], g2, s.beta2)


def to_kzg_srs(state: Phase1):
    """Ceremony output -> kzg.SRS (PLONK consumes tau powers directly)."""
    from gnark_tpu.backend import kzg as kzg_mod
    from gnark_tpu.backend.groth16 import _encode_affine_host
    from gnark_tpu.ff import get_ff
    curve = state.curve
    ffp = get_ff(curve.fp.name)
    pts = state.tau1[: state.n]
    return kzg_mod.SRS(curve=curve,
                       g1_powers=_encode_affine_host(ffp, pts),
                       g1_host=list(pts),
                       g2_gen=curve.g2, g2_tau=state.tau2[1])
