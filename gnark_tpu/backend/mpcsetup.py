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

Phase 2 below (init_phase2/contribute_phase2/verify_phase2_link/
extract_keys) specializes the tau powers to a compiled R1CS via a
host group-iFFT Lagrange basis (lagrange.go analog) and runs the
delta contribution chain; extract_keys emits (pk, vk) directly usable
by backend.groth16 prove/verify (gamma = 1, as in the reference's
ceremony keys). Contributions carry transcript-bound PoKs (make_pok:
base point derived from the transcript hash, mpcsetup.UpdateProof
analog), closing the round-1 replay caveat.
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
    # transcript-bound PoKs (tau', alpha', beta'), phase1.go UpdateProof
    poks: tuple = ()


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


def _apply_phase1(state: Phase1, tau: int, alpha: int,
                  beta: int) -> Phase1:
    """Scale a Phase1 state by a (tau, alpha, beta) update."""
    curve = state.curve
    q = curve.fr.modulus
    f1, f2 = curve.host_fp, curve.host_g2_field

    def scale_powers(points, base_scalar, extra=1):
        out = []
        acc = extra % q
        for p in points:
            out.append(host.ec_mul(f1, p, acc))
            acc = acc * base_scalar % q
        return out

    return Phase1(
        curve=curve, n=state.n,
        tau1=scale_powers(state.tau1, tau),
        tau2=[host.ec_mul(f2, p, pow(tau, i, q))
              for i, p in enumerate(state.tau2)],
        alpha_tau1=scale_powers(state.alpha_tau1, tau, extra=alpha),
        beta_tau1=scale_powers(state.beta_tau1, tau, extra=beta),
        beta2=host.ec_mul(f2, state.beta2, beta),
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
    new = _apply_phase1(state, tau, alpha, beta)
    tr = _transcript_digest(state)
    poks = tuple(make_pok(curve, s, tr + tag)
                 for s, tag in ((tau, b"tau"), (alpha, b"alpha"),
                                (beta, b"beta")))
    proof = Contribution(
        tau_pub=(host.ec_mul(f1, curve.g1, tau),
                 host.ec_mul(f2, curve.g2, tau)),
        alpha_pub=(host.ec_mul(f1, curve.g1, alpha),
                   host.ec_mul(f2, curve.g2, alpha)),
        beta_pub=(host.ec_mul(f1, curve.g1, beta),
                  host.ec_mul(f2, curve.g2, beta)),
        poks=poks,
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

    # transcript-bound PoKs: secrets bound to the prev-state digest
    # (replay/adaptation of another participant's share fails here)
    tr = _transcript_digest(prev)
    if len(proof.poks) != 3:
        return False
    for pok, pub, tag in zip(proof.poks,
                             (proof.tau_pub, proof.alpha_pub,
                              proof.beta_pub),
                             (b"tau", b"alpha", b"beta")):
        if pok.pub1 != pub[0] or pok.pub2 != pub[1]:
            return False
        if not verify_pok(curve, pok, tr + tag):
            return False

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


# ---------------------------------------------------------------------------
# transcript-bound proofs of knowledge (phase1.go UpdateProof hardening)
# ---------------------------------------------------------------------------

def _hash_to_g1(curve, data: bytes):
    """Try-and-increment hash to a G1 point (cofactor-cleared). Used
    only as a PoK base, where any unpredictable point works."""
    import hashlib
    f1 = curve.host_fp
    p = curve.fp.modulus
    ctr = 0
    while True:
        h = hashlib.sha256(b"gnark-tpu-pok" + data
                           + ctr.to_bytes(4, "big")).digest()
        x = int.from_bytes(h, "big") % p
        rhs = (x * x % p * x + curve.b) % p
        y = _sqrt_mod(rhs, p)
        if y is not None:
            P = (x, min(y, p - y))
            if curve.h1 != 1:
                P = host.ec_mul(f1, P, curve.h1)
                if P is host.INF:
                    ctr += 1
                    continue
            return P
        ctr += 1


def _sqrt_mod(a: int, p: int):
    """Tonelli-Shanks (p odd prime); None if non-residue."""
    a %= p
    if a == 0:
        return 0
    if pow(a, (p - 1) // 2, p) != 1:
        return None
    if p % 4 == 3:
        return pow(a, (p + 1) // 4, p)
    # general case
    s, q = 0, p - 1
    while q % 2 == 0:
        s += 1
        q //= 2
    z = 2
    while pow(z, (p - 1) // 2, p) != p - 1:
        z += 1
    m, c, t, r = s, pow(z, q, p), pow(a, q, p), pow(a, (q + 1) // 2, p)
    while t != 1:
        i, t2 = 0, t
        while t2 != 1:
            t2 = t2 * t2 % p
            i += 1
        b = pow(c, 1 << (m - i - 1), p)
        m, c = i, b * b % p
        t = t * c % p
        r = r * b % p
    return r


@dataclasses.dataclass
class PoK:
    """Schnorr-free knowledge proof: s*H for a transcript-derived base
    H (phase1.go UpdateProof: binds the contribution to the chain so
    it cannot be replayed or adapted)."""
    pub1: tuple        # [s]_1
    pub2: tuple        # [s]_2
    sH: tuple          # s * hash_to_g1(transcript || [s]_1)


def _transcript_digest(state) -> bytes:
    import hashlib
    h = hashlib.sha256()
    for pt in (state.tau1[1], state.alpha_tau1[0], state.beta_tau1[0]):
        if pt is host.INF:
            h.update(b"\x00")
        else:
            nb = -(-state.curve.fp.modulus.bit_length() // 8)
            h.update(pt[0].to_bytes(nb, "big"))
            h.update(pt[1].to_bytes(nb, "big"))
    return h.digest()


def make_pok(curve, s: int, transcript: bytes) -> PoK:
    f1, f2 = curve.host_fp, curve.host_g2_field
    pub1 = host.ec_mul(f1, curve.g1, s)
    nb = -(-curve.fp.modulus.bit_length() // 8)
    base = _hash_to_g1(curve, transcript + pub1[0].to_bytes(nb, "big")
                       + pub1[1].to_bytes(nb, "big"))
    return PoK(pub1=pub1,
               pub2=host.ec_mul(f2, curve.g2, s),
               sH=host.ec_mul(f1, base, s))


def verify_pok(curve, pok: PoK, transcript: bytes) -> bool:
    pairing = get_pairing(curve.name)
    if pok.pub1 is host.INF:
        return False
    nb = -(-curve.fp.modulus.bit_length() // 8)
    base = _hash_to_g1(curve, transcript + pok.pub1[0].to_bytes(nb, "big")
                       + pok.pub1[1].to_bytes(nb, "big"))
    # e([s]1, g2) == e(g1, [s]2) and e(sH, g2) == e(H, [s]2)
    return (_same_ratio(pairing, curve.g1, pok.pub1, curve.g2, pok.pub2)
            and _same_ratio(pairing, base, pok.sH, curve.g2, pok.pub2))


# ---------------------------------------------------------------------------
# Phase 2: circuit specialization (phase2.go:26-340 + lagrange.go)
# ---------------------------------------------------------------------------

def _group_ifft(f, points, omega_inv: int, q: int):
    """Radix-2 in-place iFFT over group elements: [p(omega^i)] ->
    Lagrange-coefficient points. Twiddle mult = ec_mul (host).
    Reference analog: mpcsetup lagrange.go group FFT."""
    n = len(points)
    assert n & (n - 1) == 0
    # bit-reverse copy
    a = list(points)
    j = 0
    for i in range(1, n):
        bit = n >> 1
        while j & bit:
            j ^= bit
            bit >>= 1
        j |= bit
        if i < j:
            a[i], a[j] = a[j], a[i]
    ln = 2
    while ln <= n:
        wl = pow(omega_inv, n // ln, q)
        for i in range(0, n, ln):
            wj = 1
            for k in range(ln // 2):
                u = a[i + k]
                v = host.ec_mul(f, a[i + k + ln // 2], wj)
                a[i + k] = host.ec_add(f, u, v)
                a[i + k + ln // 2] = host.ec_add(f, u, host.ec_neg(f, v))
                wj = wj * wl % q
        ln <<= 1
    n_inv = pow(n, -1, q)
    return [host.ec_mul(f, pt, n_inv) for pt in a]


@dataclasses.dataclass
class Phase2:
    curve: curves_mod.Curve
    N: int               # domain size
    nb_pub: int
    # delta-dependent (scaled by each contribution):
    delta1: tuple
    delta2: tuple
    z: list              # [delta^-1 (tau^N - 1) tau^i]_1, i < N-1
    pkk: list            # [delta^-1 K_priv_i]_1
    # fixed at init (delta-free):
    a1: list             # [A_i(tau)]_1 per wire
    b1: list             # [B_i(tau)]_1 per wire
    b2: list             # [B_i(tau)]_2 per wire
    vkk: list            # [K_pub_i]_1 (gamma = 1 in ceremonies)
    z_base: list         # [(tau^N-1) tau^i]_1 (delta = 1 reference)
    pkk_base: list


def init_phase2(cs, ph1: Phase1) -> Phase2:
    """Specialize powers-of-tau to a compiled R1CS (delta = 1)."""
    assert cs.kind == "r1cs"
    assert not cs.commitments, "ceremony + BSB22 pedersen: later leg"
    curve = ph1.curve
    q = curve.fr.modulus
    f1, f2 = curve.host_fp, curve.host_g2_field
    nb_con = cs.nb_constraints
    nb_wires = cs.nb_wires
    nb_pub = cs.nb_public
    N = 1 << (max(nb_con, 1) - 1).bit_length()   # next power of two
    assert len(ph1.tau1) >= 2 * N - 1, "phase1 too small for this circuit"

    w = curve.fr.root_of_unity(N)
    w_inv = pow(w, -1, q)
    lag1 = _group_ifft(f1, ph1.tau1[:N], w_inv, q)
    lag_a = _group_ifft(f1, ph1.alpha_tau1[:N], w_inv, q)
    lag_b = _group_ifft(f1, ph1.beta_tau1[:N], w_inv, q)
    lag2 = _group_ifft(f2, ph1.tau2[:N], w_inv, q)

    a1 = [host.INF] * nb_wires
    b1 = [host.INF] * nb_wires
    b2 = [host.INF] * nb_wires
    kv = [host.INF] * nb_wires   # [(beta A + alpha B + C)_i]_1
    for j, con in enumerate(cs.r1cs):
        for coeff, wire in con.l:
            a1[wire] = host.ec_add(f1, a1[wire],
                                   host.ec_mul(f1, lag1[j], coeff))
            kv[wire] = host.ec_add(f1, kv[wire],
                                   host.ec_mul(f1, lag_b[j], coeff))
        for coeff, wire in con.r:
            b1[wire] = host.ec_add(f1, b1[wire],
                                   host.ec_mul(f1, lag1[j], coeff))
            b2[wire] = host.ec_add(f2, b2[wire],
                                   host.ec_mul(f2, lag2[j], coeff))
            kv[wire] = host.ec_add(f1, kv[wire],
                                   host.ec_mul(f1, lag_a[j], coeff))
        for coeff, wire in con.o:
            kv[wire] = host.ec_add(f1, kv[wire],
                                   host.ec_mul(f1, lag1[j], coeff))

    # Z base: [(tau^N - 1) tau^i]_1 = [tau^(N+i)]_1 - [tau^i]_1
    z_base = [host.ec_add(f1, ph1.tau1[N + i],
                          host.ec_neg(f1, ph1.tau1[i]))
              for i in range(N - 1)]
    pkk_base = kv[nb_pub:]
    vkk = kv[:nb_pub]

    return Phase2(curve=curve, N=N, nb_pub=nb_pub,
                  delta1=curve.g1, delta2=curve.g2,
                  z=list(z_base), pkk=list(pkk_base),
                  a1=a1, b1=b1, b2=b2, vkk=vkk,
                  z_base=z_base, pkk_base=pkk_base)


def _apply_phase2(state: Phase2, d: int) -> Phase2:
    curve = state.curve
    q = curve.fr.modulus
    d_inv = pow(d, -1, q)
    f1, f2 = curve.host_fp, curve.host_g2_field
    return dataclasses.replace(
        state,
        delta1=host.ec_mul(f1, state.delta1, d),
        delta2=host.ec_mul(f2, state.delta2, d),
        z=[host.ec_mul(f1, p, d_inv) for p in state.z],
        pkk=[host.ec_mul(f1, p, d_inv) for p in state.pkk],
    )


def contribute_phase2(state: Phase2, rng=None):
    """Mix a fresh delta' in; returns (new_state, PoK)."""
    curve = state.curve
    q = curve.fr.modulus
    rnd = rng.randrange if rng else (lambda m: secrets.randbelow(m))
    d = rnd(q) or 1
    new = _apply_phase2(state, d)
    nb = -(-curve.fp.modulus.bit_length() // 8)
    tr = b"phase2" + (state.delta1[0].to_bytes(nb, "big")
                      if state.delta1 is not host.INF else b"\x00")
    return new, make_pok(curve, d, tr)


def verify_phase2_link(prev: Phase2, new: Phase2, pok: PoK) -> bool:
    curve = prev.curve
    pairing = get_pairing(curve.name)
    nb = -(-curve.fp.modulus.bit_length() // 8)
    tr = b"phase2" + (prev.delta1[0].to_bytes(nb, "big")
                      if prev.delta1 is not host.INF else b"\x00")
    if not verify_pok(curve, pok, tr):
        return False
    # delta chain: e(new.delta1, g2) == e(prev.delta1, [d]_2)
    if not _same_ratio(pairing, new.delta1, prev.delta1,
                       pok.pub2, curve.g2):
        return False
    # delta1/delta2 consistency
    if not _same_ratio(pairing, curve.g1, new.delta1,
                       curve.g2, new.delta2):
        return False
    # z and pkk correctly divided by the accumulated delta:
    # e(z_i, delta2) == e(z_base_i, g2)
    for zb, zc in zip(new.z_base, new.z):
        if zb is host.INF or zc is host.INF:
            if (zb is host.INF) != (zc is host.INF):
                return False
            continue
        if not pairing.ext.eq(
                pairing.pairing_product(
                    [(zc, new.delta2),
                     (host.ec_neg(curve.host_fp, zb), curve.g2)]),
                pairing.gt_one()):
            return False
    for kb, kc in zip(new.pkk_base, new.pkk):
        if kb is host.INF or kc is host.INF:
            if (kb is host.INF) != (kc is host.INF):
                return False
            continue
        if not pairing.ext.eq(
                pairing.pairing_product(
                    [(kc, new.delta2),
                     (host.ec_neg(curve.host_fp, kb), curve.g2)]),
                pairing.gt_one()):
            return False
    return True


def extract_keys(cs, ph1: Phase1, ph2: Phase2):
    """Ceremony output -> (ProvingKey, VerifyingKey) compatible with
    backend.groth16 prove/verify (gamma = 1, like the reference's
    mpcsetup key extraction)."""
    from gnark_tpu.backend.groth16 import (ProvingKey, VerifyingKey,
                                           _encode_affine_host, _g2_field)
    from gnark_tpu.ff import get_ff
    curve = ph1.curve
    ffp = get_ff(curve.fp.name)
    ff2 = _g2_field(curve)
    f1 = curve.host_fp
    pairing = get_pairing(curve.name)

    z_full = list(ph2.z) + [host.INF]          # prove uses z[:N-1]
    pk = ProvingKey(
        curve=curve, domain_n=ph2.N,
        g1_a=_encode_affine_host(ffp, ph2.a1),
        g1_b=_encode_affine_host(ffp, ph2.b1),
        g1_z=_encode_affine_host(ffp, z_full),
        g1_k=_encode_affine_host(ffp, ph2.pkk),
        g2_b=_encode_affine_host(ff2, ph2.b2),
        g1_alpha=ph1.alpha_tau1[0], g1_beta=ph1.beta_tau1[0],
        g1_delta=ph2.delta1,
        g2_beta=ph1.beta2, g2_delta=ph2.delta2)
    f2h = curve.host_g2_field
    vk = VerifyingKey(
        curve=curve, g1_k=list(ph2.vkk),
        g2_gamma_neg=host.ec_neg(f2h, curve.g2),
        g2_delta_neg=host.ec_neg(f2h, ph2.delta2),
        e_alpha_beta=pairing.pairing_product(
            [(ph1.alpha_tau1[0], ph1.beta2)]),
        g1_alpha=ph1.alpha_tau1[0], g2_beta=ph1.beta2,
        g2_gamma=curve.g2, g2_delta=ph2.delta2)
    return pk, vk


# ---------------------------------------------------------------------------
# Seal: beacon finalization (reference phase1.go:153-181 Seal +
# mpcsetup.BeaconContributions, setup.go:27-40)
# ---------------------------------------------------------------------------

DST_PHASE1 = b"Groth16 MPC Setup - Phase 1"
DST_PHASE2 = b"Groth16 MPC Setup - Phase2"


def _beacon_scalars(digest: bytes, dst: bytes, beacon: bytes,
                    n: int, q: int) -> list:
    """Deterministic public update scalars from a randomness beacon:
    scalar_i = hash_to_field(digest || beacon || i, dst). PUBLICLY
    recomputable, so the final update needs no PoK and the last
    private contributor cannot grind the output (the beacon value is
    fixed later in time than every contribution)."""
    from gnark_tpu.utils.hash_to_field import hash_to_field
    return [hash_to_field(digest + beacon + i.to_bytes(4, "big"),
                          dst, 1, q)[0] or 1 for i in range(n)]


def seal_phase1(state: Phase1, beacon: bytes) -> Phase1:
    """Final beacon contribution to tau/alpha/beta (Phase1.Seal)."""
    q = state.curve.fr.modulus
    tau, alpha, beta = _beacon_scalars(
        _transcript_digest(state), DST_PHASE1, beacon, 3, q)
    return _apply_phase1(state, tau, alpha, beta)


def verify_seal_phase1(prev: Phase1, sealed: Phase1,
                       beacon: bytes) -> bool:
    """The seal is deterministic: re-derive and compare."""
    s = seal_phase1(prev, beacon)
    return (s.tau1 == sealed.tau1 and s.tau2 == sealed.tau2
            and s.alpha_tau1 == sealed.alpha_tau1
            and s.beta_tau1 == sealed.beta_tau1
            and s.beta2 == sealed.beta2)


def seal_phase2(state: Phase2, beacon: bytes) -> Phase2:
    """Final beacon contribution to delta (Phase2 Seal, setup.go:30)."""
    curve = state.curve
    q = curve.fr.modulus
    nb = -(-curve.fp.modulus.bit_length() // 8)
    digest = b"phase2" + (state.delta1[0].to_bytes(nb, "big")
                          if state.delta1 is not host.INF else b"\x00")
    (d,) = _beacon_scalars(digest, DST_PHASE2, beacon, 1, q)
    return _apply_phase2(state, d)


def verify_seal_phase2(prev: Phase2, sealed: Phase2,
                       beacon: bytes) -> bool:
    s = seal_phase2(prev, beacon)
    return (s.delta1 == sealed.delta1 and s.delta2 == sealed.delta2
            and s.z == sealed.z and s.pkk == sealed.pkk)
