"""PLONK backend: Setup / Prove / Verify (KZG-based, with BSB22
commitments via Qcp columns).

Protocol-equivalent reimplementation of the reference's per-curve PLONK
(backend/plonk/bn254/{setup,prove,verify}.go; SURVEY.md §3.4):

  * trace: ql/qr/qm/qo/qk columns with nb_public placeholder rows
    (ql=-1) before the gates (setup.go NewTrace), permutation built
    over 3N slots by variable cycles (setup.go buildPermutation).
  * prover pipeline: solve -> complete qk -> blind+commit L,R,O ->
    gamma,beta -> Z ratio-cumprod -> commit Z -> alpha -> quotient on
    the 4N coset -> h0,h1,h2 -> zeta -> linearized polynomial ->
    Z(omega*zeta) opening + batched single-point opening at zeta
    (prove.go:121-145 stage list).
  * verifier: recompute challenges, PI(zeta), constLin check, fold the
    linearized digest, 2 KZG opening checks (verify.go:36-310).

Fiat-Shamir is gnark-bit-exact by default (gnark_fs.py: sha256
transcript "gamma","beta","alpha","zeta", uncompressed point marshals,
fr/hash_to_field "BSB22-Plonk", kzg deriveGamma folding challenge);
recursion_friendly switches to the MiMC transcript. Blinding orders
1,1,1,2 like the reference (prove.go:71-76).

The prover is fully device-resident (backend/plonk_device.py: column
gathers, NTTs, Z scan, quotient incl. the rho-pass memory mode, KZG
openings by evaluate-and-divide); setup also runs its basis changes
and commits on device and seeds pk._dev so prove never re-encodes the
static columns. The host sequences Fiat-Shamir and O(1) scalars.
"""

from __future__ import annotations

import dataclasses

import secrets

import jax.numpy as jnp
import numpy as np

from gnark_tpu.backend import kzg as kzg_mod
from gnark_tpu.backend import gnark_fs
from gnark_tpu.backend.transcript import MimcTranscript
from gnark_tpu.constraint import ConstraintSystem, solve_auto
from gnark_tpu.ec import curves as curves_mod
from gnark_tpu.ec import host
from gnark_tpu.ff import get_ff
from gnark_tpu.ntt import Domain


def _next_pow2(n: int) -> int:
    return 1 << max(n - 1, 1).bit_length() if n & (n - 1) or n == 0 else n


# ---------------------------------------------------------------------------
# keys
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class PlonkVerifyingKey:
    curve: curves_mod.Curve
    size: int                 # N
    generator: int            # omega
    coset_shift: int          # u
    nb_public: int
    s_comm: list              # [S1], [S2], [S3] host G1 points
    ql_c: tuple
    qr_c: tuple
    qm_c: tuple
    qo_c: tuple
    qk_c: tuple               # incomplete qk commitment
    g2_gen: tuple
    g2_tau: tuple
    # BSB22 commitments (reference setup.go:57-62): one Qcp selector
    # digest + the COMMITMENT constraint row index per api.commit
    qcp_c: list = dataclasses.field(default_factory=list)
    commitment_rows: list = dataclasses.field(default_factory=list)


@dataclasses.dataclass
class PlonkProvingKey:
    vk: PlonkVerifyingKey
    srs: kzg_mod.SRS
    # Lagrange-basis trace columns (host ints, length N)
    ql: list
    qr: list
    qm: list
    qo: list
    qk: list                  # incomplete
    # canonical coeffs of the q's and sigmas (host ints)
    ql_coeffs: list
    qr_coeffs: list
    qm_coeffs: list
    qo_coeffs: list
    qk_coeffs: list
    s1_coeffs: list
    s2_coeffs: list
    s3_coeffs: list
    s1_vals: list             # sigma evaluations on the domain (ints)
    s2_vals: list
    s3_vals: list
    perm: list                # full 3N permutation
    qcp_coeffs: list = dataclasses.field(default_factory=list)


@dataclasses.dataclass
class PlonkProof:
    lro: list                 # 3 G1 commitments (blinded l, r, o)
    z: tuple                  # commitment to blinded Z
    h: list                   # 3 quotient shard commitments
    batched_h: tuple          # folded opening quotient at zeta
    claimed: list             # [lin(z), l, r, o, s1, s2, qcp_i(z)...]
    z_shift_h: tuple          # opening quotient of Z at omega*zeta
    zu: int                   # Z(omega*zeta)
    bsb22: list = dataclasses.field(default_factory=list)  # pi2 commits


# ---------------------------------------------------------------------------
# Setup
# ---------------------------------------------------------------------------

def setup(cs: ConstraintSystem, srs: kzg_mod.SRS):
    assert cs.kind == "scs", "plonk needs an SCS (PLONKish) circuit"
    curve = srs.curve
    q = curve.fr.modulus
    assert q == cs.q
    nb_pub = cs.nb_public
    N = _next_pow2(nb_pub + cs.nb_constraints)
    srs_len = (len(srs.g1_host) or
               (srs.g1_powers[0].shape[0] if srs.g1_powers is not None
                else 0))
    if srs_len < N + 3:
        raise ValueError(f"SRS too small: need {N + 3}, got {srs_len}")

    w = curve.fr.root_of_unity(N)
    u = curve.fr.generator % q

    # trace columns with placeholder rows (setup.go NewTrace)
    ql = [0] * N; qr = [0] * N; qm = [0] * N; qo = [0] * N; qk = [0] * N
    for i in range(nb_pub):
        ql[i] = q - 1
    off = nb_pub
    for j, con in enumerate(cs.sparse):
        ql[off + j] = con.qL
        qr[off + j] = con.qR
        qm[off + j] = con.qM
        qo[off + j] = con.qO
        qk[off + j] = con.qC

    # permutation over 3N slots (setup.go buildPermutation)
    lro = [0] * (3 * N)
    for i in range(nb_pub):
        lro[i] = i
    for j, con in enumerate(cs.sparse):
        lro[off + j] = con.xa
        lro[N + off + j] = con.xb
        lro[2 * N + off + j] = con.xo
    nb_vars = cs.nb_wires
    perm = [-1] * (3 * N)
    cycle = [-1] * nb_vars
    for i in range(3 * N):
        if cycle[lro[i]] != -1:
            perm[i] = cycle[lro[i]]
        cycle[lro[i]] = i
    for i in range(3 * N):
        if perm[i] == -1:
            perm[i] = cycle[lro[i]]

    # sigma evaluations: slot j encodes u^(j//N) * w^(j%N)
    wpow = [1] * N
    for i in range(1, N):
        wpow[i] = wpow[i - 1] * w % q
    def evalpoint(j):
        return pow(u, j // N, q) * wpow[j % N] % q
    s1_vals = [evalpoint(perm[i]) for i in range(N)]
    s2_vals = [evalpoint(perm[N + i]) for i in range(N)]
    s3_vals = [evalpoint(perm[2 * N + i]) for i in range(N)]

    # device basis changes + commits: each column is Montgomery-encoded
    # ONCE, iFFT'd and committed on device; the host int coeff lists
    # are decoded once for serialization/verify compat, and the device
    # arrays are seeded into pk._dev so prove() skips re-encoding
    from gnark_tpu.backend import plonk_device as pdev
    from gnark_tpu.ntt import get_domain
    ffr = get_ff(curve.fr.name)
    dom = get_domain(ffr, N)
    dev: dict = {}
    coeffs = {}
    comms = {}
    lag_cols = [("ql", ql), ("qr", qr), ("qm", qm), ("qo", qo),
                ("qk", qk), ("s1", s1_vals), ("s2", s2_vals),
                ("s3", s3_vals)]
    for name, vals in lag_cols:
        v = jnp.asarray(ffr.encode(vals))
        if name == "qk":
            dev["qk_lag"] = v
        if name in ("s1", "s2", "s3"):
            dev[name + "_v"] = v
        c_dev = dom.ifft(v)
        dev[name + "_c"] = c_dev
        coeffs[name] = [int(x) for x in ffr.decode(np.asarray(c_dev))]
        comms[name] = pdev.commit_dev(srs, c_dev)
    dev["wpow"] = pdev.dev_powers(ffr, w, N)

    # BSB22 Qcp selector columns: 1 at each COMMITTED row
    # (reference setup.go:211-218 commitTrace)
    qcp_coeffs = []
    qcp_comms = []
    dev["qcp_c"] = []
    for cm in cs.commitments:
        col = [0] * N
        for row in cm.committed_rows:
            col[off + row] = 1
        c_dev = dom.ifft(jnp.asarray(ffr.encode(col)))
        dev["qcp_c"].append(c_dev)
        qcp_coeffs.append([int(x) for x in ffr.decode(np.asarray(c_dev))])
        qcp_comms.append(pdev.commit_dev(srs, c_dev))

    vk = PlonkVerifyingKey(
        curve=curve, size=N, generator=w, coset_shift=u, nb_public=nb_pub,
        s_comm=[comms["s1"], comms["s2"], comms["s3"]],
        ql_c=comms["ql"], qr_c=comms["qr"], qm_c=comms["qm"],
        qo_c=comms["qo"], qk_c=comms["qk"],
        g2_gen=srs.g2_gen, g2_tau=srs.g2_tau,
        qcp_c=qcp_comms,
        commitment_rows=[cm.commitment_row for cm in cs.commitments])
    pk = PlonkProvingKey(
        vk=vk, srs=srs, ql=ql, qr=qr, qm=qm, qo=qo, qk=qk,
        ql_coeffs=coeffs["ql"], qr_coeffs=coeffs["qr"],
        qm_coeffs=coeffs["qm"], qo_coeffs=coeffs["qo"],
        qk_coeffs=coeffs["qk"], s1_coeffs=coeffs["s1"],
        s2_coeffs=coeffs["s2"], s3_coeffs=coeffs["s3"],
        s1_vals=s1_vals, s2_vals=s2_vals, s3_vals=s3_vals, perm=perm,
        qcp_coeffs=qcp_coeffs)
    pk._dev = dev
    return pk, vk


# ---------------------------------------------------------------------------
# transcript binding (shared by prove/verify)
# ---------------------------------------------------------------------------

from gnark_tpu.backend.transcript import outer_mimc_field as \
    _outer_mimc_field


def _new_transcript(vk: PlonkVerifyingKey, recursion=False,
                    challenge_hash=None):
    """challenge_hash: optional hashlib-style factory replacing sha256
    (reference backend.WithProverChallengeHashFunction /
    ProverConfig.ChallengeHash, backend.go:59-82); prover and verifier
    must agree on it."""
    names = ["gamma", "beta", "alpha", "zeta"]
    if recursion:
        return MimcTranscript(vk.curve.fr.modulus, names,
                              _outer_mimc_field(vk.curve, recursion))
    # default: gnark-bit-exact fiat-shamir (prove.go:217) — the
    # transcript and all point/element marshals match gnark-crypto,
    # so challenges (and proofs) cross-verify with gnark
    ts = gnark_fs.GnarkTranscript(vk.curve.fr.modulus, names,
                                  challenge_hash)
    ts.point_bytes = lambda P, p_mod, _c=vk.curve: gnark_fs.g1_raw_bytes(
        _c, None if P is host.INF else P)
    return ts


def _bind_public_data(ts: Transcript, vk: PlonkVerifyingKey, publics):
    p = vk.curve.fp.modulus
    for pt in vk.s_comm:
        ts.bind("gamma", ts.point_bytes(pt, p))
    for pt in (vk.ql_c, vk.qr_c, vk.qm_c, vk.qo_c, vk.qk_c):
        ts.bind("gamma", ts.point_bytes(pt, p))
    for pt in vk.qcp_c:
        ts.bind("gamma", ts.point_bytes(pt, p))
    for v in publics:
        ts.bind("gamma", ts.fe_bytes(v))


def _fold_challenge(vk, digests, zeta, zu, claimed,
                    recursion=False) -> int:
    """KZG batch-fold challenge (gnark kzg.BatchOpenSinglePoint gamma).

    Binds the claimed evaluation values too, like gnark-crypto's
    deriveGamma (kzg.go BatchOpenSinglePoint): the Fiat-Shamir
    transcript must cover everything the verifier consumes."""
    p = vk.curve.fp.modulus
    if recursion:
        ts = MimcTranscript(vk.curve.fr.modulus, ["fold"],
                            _outer_mimc_field(vk.curve, recursion))
        for d in digests:
            ts.bind("fold", ts.point_bytes(d, p))
        ts.bind("fold", ts.fe_bytes(zeta))
        ts.bind("fold", ts.fe_bytes(zu))
        for v in claimed:
            ts.bind("fold", ts.fe_bytes(v))
        return ts.challenge("fold")
    # gnark-crypto kzg deriveGamma: point, digests, claimed values,
    # then the shifted-Z claimed value as extra transcript data
    # (prove.go:828-836 BatchOpenSinglePoint call)
    q = vk.curve.fr.modulus
    nb = -(-q.bit_length() // 8)
    return gnark_fs.kzg_fold_challenge(
        vk.curve, q, zeta,
        [None if d is host.INF else d for d in digests], claimed,
        extra=(zu % q).to_bytes(nb, "big"))


# ---------------------------------------------------------------------------
# Prove
# ---------------------------------------------------------------------------

def _h2f_bsb22(curve, point, recursion=False) -> int:
    """Commitment challenge from a pi2 commitment. Default: gnark's
    fr/hash_to_field with dst "BSB22-Plonk" over the uncompressed
    point bytes (prove.go:206-207,305-312) — bit-exact.
    recursion: MiMC over the outer field (self-consistent)."""
    if recursion:
        from gnark_tpu.backend.transcript import mimc_point_writes
        from gnark_tpu.std.hash.mimc import MiMC
        h = MiMC(_outer_mimc_field(curve, recursion))
        h.write(int.from_bytes(b"BSB22-Plonk", "big"))
        h.write(*mimc_point_writes(
            curve, None if point is host.INF else point, recursion))
        mask = (1 << (curve.fr.modulus.bit_length() - 8)) - 1
        return h.sum() & mask
    return gnark_fs.bsb22_plonk_value(
        curve, None if point is host.INF else point, curve.fr.modulus)


def prove(cs: ConstraintSystem, pk: PlonkProvingKey, public, secret,
          rng=None, hint_overrides=None,
          recursion_friendly: bool = False,
          statistical_zk: bool = False,
          challenge_hash=None) -> "PlonkProof":
    """Prove on the device-resident pipeline (backend/plonk_device.py:
    columns/NTTs/Z-scan/quotient/openings all on device; the host only
    sequences Fiat-Shamir and O(1) scalars).

    recursion_friendly: derive every Fiat-Shamir challenge with the
    MiMC transcript over the 2-chain outer field (reference
    backend.WithProverChallengeHashFunction + recursion.NewShort), so
    std/recursion/plonk can recompute them in-circuit natively.
    Default: gnark-bit-exact sha256 transcript (gnark_fs.py)."""
    from gnark_tpu.backend import plonk_device
    return plonk_device.prove(
        cs, pk, public, secret, rng=rng, hint_overrides=hint_overrides,
        recursion_friendly=recursion_friendly,
        statistical_zk=statistical_zk, challenge_hash=challenge_hash)


def _lin_digest_prover(pk, vk, c_z, c_h, lz, rz, oz, _s1, coeff_z,
                       zh_zeta, zp2, bsb22_pts=(), qcpz=()):
    """Commitment to the linearized polynomial, computed like the
    verifier does (verify.go:263-280) so both sides agree."""
    q = vk.curve.fr.modulus
    f1 = vk.curve.host_fp
    rl = lz * rz % q
    pts = list(bsb22_pts) + [vk.ql_c, vk.qr_c, vk.qm_c, vk.qo_c, vk.qk_c,
                             vk.s_comm[2], c_z, c_h[0], c_h[1], c_h[2]]
    zh = (q - zh_zeta) % q
    sc = list(qcpz) + [lz, rz, rl, oz, 1, _s1, coeff_z,
                       zh, zh * zp2 % q, zh * zp2 % q * zp2 % q]
    acc = host.INF
    for P, s in zip(pts, sc):
        acc = host.ec_add(f1, acc, host.ec_mul(f1, P, s))
    return acc


# ---------------------------------------------------------------------------
# Verify
# ---------------------------------------------------------------------------

def verify(proof: PlonkProof, vk: PlonkVerifyingKey, public_values,
           recursion_friendly: bool = False,
           challenge_hash=None) -> bool:
    curve = vk.curve
    q = curve.fr.modulus
    N = vk.size
    w = vk.generator
    u = vk.coset_shift
    if len(public_values) != vk.nb_public - 1:
        raise ValueError(f"want {vk.nb_public - 1} public values")
    publics = [1] + [v % q for v in public_values]  # constant-one wire

    # proof shape checks (verify.go:45-59)
    if len(proof.bsb22) != len(vk.qcp_c):
        return False
    if len(proof.claimed) != 6 + len(vk.qcp_c):
        return False
    # untrusted-point hardening: on-curve + subgroup for every proof
    # point before any host EC op / pairing (gnark checks on unmarshal)
    if not host.validate_points(
            curve,
            g1_points=list(proof.lro) + [proof.z] + list(proof.h)
            + list(proof.bsb22) + [proof.batched_h, proof.z_shift_h]):
        return False
    if any(not isinstance(v, int) or not 0 <= v < q
           for v in list(proof.claimed) + [proof.zu]):
        return False

    ts = _new_transcript(vk, recursion_friendly, challenge_hash)
    _bind_public_data(ts, vk, publics)
    p_mod = curve.fp.modulus
    for pt in proof.lro:
        ts.bind("gamma", ts.point_bytes(pt, p_mod))
    gamma = ts.challenge("gamma")
    beta = ts.challenge("beta")
    for pt in proof.bsb22:
        ts.bind("alpha", ts.point_bytes(pt, p_mod))
    ts.bind("alpha", ts.point_bytes(proof.z, p_mod))
    alpha = ts.challenge("alpha")
    for pt in proof.h:
        ts.bind("zeta", ts.point_bytes(pt, p_mod))
    zeta = ts.challenge("zeta")

    zeta_n = pow(zeta, N, q)
    zh_zeta = (zeta_n - 1) % q
    n_inv = pow(N, -1, q)
    l1_zeta = zh_zeta * pow((zeta - 1) % q, -1, q) % q * n_inv % q

    # PI = sum_i w_i * L_i(zeta)
    pi = 0
    accw = 1
    for v in publics:
        li = zh_zeta * pow((zeta - accw) % q, -1, q) % q * n_inv % q \
            * accw % q
        pi = (pi + li * v) % q
        accw = accw * w % q

    # BSB22: PI += hash(pi2 commitment) * L_{cci}(zeta)
    # (verify.go:162-190) — the verifier recomputes the challenge the
    # prover's qk injection contributed at the COMMITMENT row
    for i, cci in enumerate(vk.commitment_rows):
        hashed = _h2f_bsb22(curve, proof.bsb22[i],
                            recursion_friendly)
        wi = pow(w, vk.nb_public + cci, q)
        li = zh_zeta * pow((zeta - wi) % q, -1, q) % q * n_inv % q \
            * wi % q
        pi = (pi + li * hashed) % q

    lin_z, lz, rz, oz, s1z, s2z = proof.claimed[:6]
    qcpz = list(proof.claimed[6:])
    zu = proof.zu
    alpha2 = alpha * alpha % q
    a2l1 = alpha2 * l1_zeta % q

    # constLin check (verify.go:207-223)
    t = (lz + beta * s1z + gamma) % q
    t = t * ((rz + beta * s2z + gamma) % q) % q
    t = t * ((oz + gamma) % q) % q * alpha % q * zu % q
    const_lin = (q - (pi - a2l1 + t) % q) % q
    if lin_z != const_lin:
        return False

    # linearized digest
    t1 = (lz + beta * s1z + gamma) % q
    t2 = (rz + beta * s2z + gamma) % q
    _s1 = alpha * beta % q * t1 % q * t2 % q * zu % q
    idp = (lz + beta * zeta + gamma) % q
    idp = idp * ((rz + beta * u % q * zeta + gamma) % q) % q
    idp = idp * ((oz + beta * u % q * u % q * zeta + gamma) % q) % q
    coeff_z = (a2l1 - alpha * idp) % q
    zp2 = pow(zeta, N + 2, q)

    lin_digest = _lin_digest_prover(None, vk, proof.z, tuple(proof.h),
                                    lz, rz, oz, _s1, coeff_z, zh_zeta, zp2,
                                    proof.bsb22, qcpz)

    digests = [lin_digest] + proof.lro + [vk.s_comm[0], vk.s_comm[1]] \
        + list(vk.qcp_c)
    fold_ch = _fold_challenge(vk, digests, zeta, zu, proof.claimed,
                              recursion_friendly)

    srs_shim = kzg_mod.SRS(curve=curve, g1_powers=None, g1_host=None,
                           g2_gen=vk.g2_gen, g2_tau=vk.g2_tau)
    batch = kzg_mod.BatchOpeningProof(h=proof.batched_h,
                                      claimed_values=proof.claimed)
    if not kzg_mod.batch_verify_single_point(srs_shim, digests, batch,
                                             zeta, fold_ch):
        return False
    z_open = kzg_mod.OpeningProof(h=proof.z_shift_h, claimed_value=zu)
    return kzg_mod.verify_opening(srs_shim, proof.z, z_open,
                                  w * zeta % q)
