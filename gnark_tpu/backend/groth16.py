"""Groth16 backend: Setup / Prove / Verify.

Semantics mirror the reference's generated per-curve backend
(backend/groth16/bn254/{setup,prove,verify}.go; SURVEY.md §3.2-3.3),
with the heavy kernels on TPU:

  * Setup: toxic waste + Lagrange-basis A/B/C column evaluation on the
    host (setup.go:346-436 recurrence, batch-inverted), then ONE G1 and
    ONE G2 fixed-base batch scalar multiplication on device
    (setup.go:222-233,300-302).
  * Prove: witness solve (host) -> computeH = 3 iFFT + 3 coset-FFT +
    pointwise (a*b-c)*den + coset-iFFT on device (prove.go:346-389) ->
    5 MSMs on device (prove.go:187-305) -> tiny host combination.
  * Verify: 3-Miller-loop + single final exponentiation (host Tate
    engine), e(Ar,Bs) == e(alpha,beta)*e(kSum,gamma)*e(Krs,delta)
    (verify.go:38-150).

Unlike the reference we do NOT filter infinity points out of pk.G1.A/B
(setup.go:195-219): our affine representation carries explicit infinity
masks and the MSM handles them branchlessly; zero-coefficient wires
cost bucket-0 adds that are ignored. (Perf TODO: filter to shrink MSM.)
"""

from __future__ import annotations

import dataclasses
import secrets

import jax
import jax.numpy as jnp
import numpy as np

from gnark_tpu.constraint import ConstraintSystem, solve_auto
from gnark_tpu.ec import curves as curves_mod
from gnark_tpu.ec import host
from gnark_tpu.ec.fp2 import FF2, get_ff2
from gnark_tpu.ec.weierstrass import jac_to_affine
from gnark_tpu.ff import FF, get_ff
from gnark_tpu.msm import msm
from gnark_tpu.msm.fixed_base import batch_scalar_mul
from gnark_tpu.pairing import get_pairing


def _batch_inv(vals, q):
    """Montgomery batch inversion of a list of nonzero ints."""
    n = len(vals)
    pre = [1] * (n + 1)
    for i, v in enumerate(vals):
        pre[i + 1] = pre[i] * v % q
    inv_all = pow(pre[n], -1, q)
    out = [0] * n
    for i in range(n - 1, -1, -1):
        out[i] = pre[i] * inv_all % q
        inv_all = inv_all * vals[i] % q
    return out


def _next_pow2(n: int) -> int:
    return 1 << max(n - 1, 1).bit_length() if n & (n - 1) or n == 0 else n


@dataclasses.dataclass
class CommitmentKey:
    """Pedersen key for one BSB22 commitment
    (reference: gnark-crypto pedersen.ProvingKey/VerifyingKey,
    wired by backend/groth16/bn254/setup.go:279-287)."""
    wires: tuple          # committed wire ids (public first)
    basis: list           # host G1 points, one per PRIVATE committed wire
    basis_exp_sigma: list # sigma * basis
    g2_sigma: tuple       # sigma * g2 (verifier side)
    nb_public: int = 0    # leading wires that are hashed, not committed


@dataclasses.dataclass
class ProvingKey:
    curve: curves_mod.Curve
    domain_n: int
    # device arrays: (x, y, inf) affine batches
    g1_a: tuple          # per wire
    g1_b: tuple          # per wire
    g1_z: tuple          # per domain index (n)
    g1_k: tuple          # per private wire
    g2_b: tuple          # per wire, over Fp2 (or Fp for bw6)
    # host points
    g1_alpha: tuple
    g1_beta: tuple
    g1_delta: tuple
    g2_beta: tuple
    g2_delta: tuple
    commitment_keys: list = dataclasses.field(default_factory=list)


@dataclasses.dataclass
class VerifyingKey:
    curve: curves_mod.Curve
    g1_k: list           # host affine points: publics then commitment wires
    g2_gamma_neg: tuple
    g2_delta_neg: tuple
    e_alpha_beta: tuple  # GT element (precomputed pairing)
    # for serialization / recursion:
    g1_alpha: tuple
    g2_beta: tuple
    g2_gamma: tuple
    g2_delta: tuple
    commitment_g2_sigma: list = dataclasses.field(default_factory=list)
    # per commitment: wire ids of public/prior-commitment committed
    # wires, hashed into the commitment value (verify.go:79-103
    # PublicAndCommitmentCommitted)
    commitment_pac: list = dataclasses.field(default_factory=list)


@dataclasses.dataclass
class Proof:
    ar: tuple            # G1 affine (host ints)
    krs: tuple           # G1 affine
    bs: tuple            # G2 affine
    commitments: list = dataclasses.field(default_factory=list)
    poks: list = dataclasses.field(default_factory=list)


def _pac_indices(cs, nb_pub):
    """Per commitment: 1-based indices into the EXTENDED public
    vector (publics then commitment values) of the hashed
    public/prior-commitment committed wires (the reference's
    vk.PublicAndCommitmentCommitted, verify.go:79-103)."""
    cm_idx_of_wire = {cm.commitment_wire: ci
                      for ci, cm in enumerate(cs.commitments)}
    out = []
    for cm in cs.commitments:
        idxs = []
        for w in cm.committed_wires[:cm.nb_public_committed]:
            if w < nb_pub:
                idxs.append(w)
            else:
                idxs.append(nb_pub + cm_idx_of_wire[w])
        out.append(tuple(idxs))
    return out


def _hash_to_field(curve, point, recursion: bool = False,
                   public_committed=()) -> int:
    """Commitment wire value from a commitment point. Default: gnark's
    fr/hash_to_field with dst "bsb22-commitment"
    (constraint.CommitmentDst) over the uncompressed point bytes
    (backend/groth16/bn254/prove.go:57-58,87-96) — bit-exact,
    including the SerializeCommitment public-committed value suffix
    (constraint.SerializeCommitment; empty when nothing public is
    committed).

    recursion=True: MiMC over the 2-chain outer field, truncated to
    rbits-8 bits, so the in-circuit verifier recomputes it natively
    (std/recursion/groth16 commitment support). recursion="self":
    MiMC over the curve's own fr with limb-split coordinates
    (emulated self-recursion). recursion="evm": sha256(x||y) % r, the
    solidity-contract-computable variant."""
    if recursion == "evm":
        # the reference swaps HashToFieldFn for a plain evm hash when
        # targeting the contract (verify.go:157-159)
        if public_committed:
            raise NotImplementedError(
                "public committed wires with the evm hash mode")
        import hashlib
        nb = -(-curve.fp.modulus.bit_length() // 8)
        raw = (b"\x00" * 2 * nb if point is host.INF else
               point[0].to_bytes(nb, "big")
               + point[1].to_bytes(nb, "big"))
        return int.from_bytes(hashlib.sha256(raw).digest(),
                              "big") % curve.fr.modulus
    if recursion and public_committed:
        raise NotImplementedError(
            "public committed wires with recursion-friendly hashes")
    if recursion:
        from gnark_tpu.backend.transcript import outer_mimc_field
        from gnark_tpu.std.hash.mimc import MiMC
        h = MiMC(outer_mimc_field(curve, recursion))
        from gnark_tpu.backend.transcript import mimc_point_writes
        h.write(int.from_bytes(b"BSB22-Groth16", "big"))
        h.write(*mimc_point_writes(
            curve, None if point is host.INF else point, recursion))
        mask = (1 << (curve.fr.modulus.bit_length() - 8)) - 1
        return h.sum() & mask
    from gnark_tpu.backend import gnark_fs
    return gnark_fs.bsb22_groth16_value(
        curve, None if point is host.INF else point,
        list(public_committed), curve.fr.modulus)


def _encode_affine_host(ff, pts):
    """Host affine points (or INF) -> device (x, y, inf)."""
    def coord(p, j):
        if p is host.INF:
            return 0 if not isinstance(ff, FF2) else (0, 0)
        return p[j]
    xs = [coord(p, 0) for p in pts]
    ys = [coord(p, 1) for p in pts]
    inf = jnp.asarray(np.array([p is host.INF for p in pts]))
    return (jnp.asarray(ff.encode(xs)), jnp.asarray(ff.encode(ys)), inf)


def _decode_affine(ff, A):
    """Device (x, y, inf) -> list of host points."""
    x, y, inf = A
    xs = ff.decode(np.asarray(x))
    ys = ff.decode(np.asarray(y))
    infs = np.asarray(inf).reshape(-1)
    if isinstance(ff, FF2):
        xs = np.asarray(xs, dtype=object).reshape(-1, 2)
        ys = np.asarray(ys, dtype=object).reshape(-1, 2)
        return [host.INF if infs[i] else
                ((int(xs[i][0]), int(xs[i][1])), (int(ys[i][0]), int(ys[i][1])))
                for i in range(len(infs))]
    xs = np.atleast_1d(xs)
    ys = np.atleast_1d(ys)
    return [host.INF if infs[i] else (int(xs[i]), int(ys[i]))
            for i in range(len(infs))]


def _scalar_limbs(ffr: FF, vals):
    return jnp.asarray(ffr.encode(vals, mont=False))


def _g2_field(curve):
    if curve.g2_over_fp2:
        return get_ff2(curve.fp.name, curve.fp2_nr)
    return get_ff(curve.fp.name)


# ---------------------------------------------------------------------------
# Setup
# ---------------------------------------------------------------------------

def setup(cs: ConstraintSystem, curve_name: str, rng=None):
    """Groth16 trusted setup (insecure single-party; the reference's
    mpcsetup flow is a future component). Returns (pk, vk)."""
    curve = curves_mod.CURVES[curve_name]
    q = curve.fr.modulus
    assert q == cs.q, "constraint system field != curve scalar field"
    rnd = rng.randrange if rng is not None else \
        (lambda n: secrets.randbelow(n - 1) + 1)

    nb_con = cs.nb_constraints
    nb_wires = cs.nb_wires
    nb_pub = cs.nb_public
    N = _next_pow2(max(nb_con, 1))

    # toxic waste
    t, alpha, beta, gamma, delta = (rnd(q) or 1 for _ in range(5))
    gamma_inv, delta_inv = pow(gamma, -1, q), pow(delta, -1, q)

    # Lagrange values L_i(t), i = 0..nb_con (recurrence, setup.go:346-436)
    w = curve.fr.root_of_unity(N)
    wi = 1
    tw = []
    for i in range(nb_con + 1):
        tw.append((t - wi) % q)
        wi = wi * w % q
    tw_inv = _batch_inv([v if v else 1 for v in tw], q)
    L = (pow(t, N, q) - 1) * tw_inv[0] % q * pow(N, -1, q) % q

    A = [0] * nb_wires
    B = [0] * nb_wires
    C = [0] * nb_wires
    for j, con in enumerate(cs.r1cs):
        for coeff, wire in con.l:
            A[wire] = (A[wire] + coeff * L) % q
        for coeff, wire in con.r:
            B[wire] = (B[wire] + coeff * L) % q
        for coeff, wire in con.o:
            C[wire] = (C[wire] + coeff * L) % q
        L = L * w % q * tw[j] % q * tw_inv[j + 1] % q

    # K columns: (beta*A + alpha*B + C) * gamma^-1 (public, commitment
    # wires, committed wires) / delta^-1 (other private). Commitment
    # wires verify like publics; committed wires form the Pedersen
    # bases (setup.go:140-178 commitment handling).
    committed = {}           # PRIVATE committed wire -> commitment idx
    cm_wires = {}            # commitment wire -> commitment index
    for ci, cm in enumerate(cs.commitments):
        # public/prior-commitment committed wires are hashed, not
        # Pedersen-committed: they stay ordinary vkK wires
        # (setup.go:140-178 isPublic/isCommitment branches)
        for wid in cm.committed_wires[cm.nb_public_committed:]:
            committed[wid] = ci
        cm_wires[cm.commitment_wire] = ci
    kv_all = [(beta * A[i] + alpha * B[i] + C[i]) % q
              for i in range(nb_wires)]
    vkK, pkK = [], []
    for i in range(nb_wires):
        if i < nb_pub:
            vkK.append(kv_all[i] * gamma_inv % q)
        elif i in cm_wires or i in committed:
            pkK.append(0)     # infinity: excluded from the Krs MSM
        else:
            pkK.append(kv_all[i] * delta_inv % q)
    # commitment-wire K points go to the vk (verifier recomputes values)
    vkK += [kv_all[cm.commitment_wire] * gamma_inv % q
            for cm in cs.commitments]
    # Pedersen bases in COMMITTED-WIRE ORDER over the PRIVATE wires
    # (the prover pairs the hint inputs positionally: public-committed
    # first, then private = basis order)
    ckK = [[kv_all[w] * gamma_inv % q
            for w in cm.committed_wires[cm.nb_public_committed:]]
           for cm in cs.commitments]
    sigmas = [rnd(q) or 1 for _ in cs.commitments]
    ck_scalars = []
    for ci, scal in enumerate(ckK):
        ck_scalars += scal + [s * sigmas[ci] % q for s in scal]

    # Z column: (t^N - 1) * delta^-1 * t^i
    zdt = (pow(t, N, q) - 1) * delta_inv % q
    Z = []
    for _ in range(N):
        Z.append(zdt)
        zdt = zdt * t % q

    # one G1 batch scalar mul: [alpha, beta, delta] + A + B + Z + vkK + pkK
    ffp = get_ff(curve.fp.name)
    ffr = get_ff(curve.fr.name)
    g1_scalars = [alpha, beta, delta] + A + B + Z + vkK + pkK + ck_scalars
    pts = _decode_affine(ffp, jac_to_affine(ffp, batch_scalar_mul(
        ffp, _g1_base(ffp, curve), curve.fr.bits,
        _scalar_limbs(ffr, g1_scalars))))
    g1_alpha, g1_beta, g1_delta = pts[0], pts[1], pts[2]
    off = 3
    g1_A = pts[off:off + nb_wires]; off += nb_wires
    g1_B = pts[off:off + nb_wires]; off += nb_wires
    g1_Z = pts[off:off + N]; off += N
    nb_vk = nb_pub + len(cs.commitments)
    g1_vkK = pts[off:off + nb_vk]; off += nb_vk
    g1_pkK = pts[off:off + nb_wires - nb_pub]; off += nb_wires - nb_pub
    g1_ck = pts[off:]

    # one G2 batch: [beta, delta, gamma, sigmas...] + B
    ff2 = _g2_field(curve)
    g2_scalars = [beta, delta, gamma] + sigmas + B
    pts2 = _decode_affine(ff2, jac_to_affine(ff2, batch_scalar_mul(
        ff2, _g2_base(ff2, curve), curve.fr.bits,
        _scalar_limbs(ffr, g2_scalars))))
    g2_beta, g2_delta, g2_gamma = pts2[0], pts2[1], pts2[2]
    g2_sigmas = pts2[3:3 + len(sigmas)]
    g2_B = pts2[3 + len(sigmas):]

    # assemble per-commitment Pedersen keys
    commitment_keys = []
    off_ck = 0
    for ci, cm in enumerate(cs.commitments):
        nb = len(ckK[ci])
        basis = g1_ck[off_ck:off_ck + nb]
        basis_sig = g1_ck[off_ck + nb:off_ck + 2 * nb]
        off_ck += 2 * nb
        commitment_keys.append(CommitmentKey(
            wires=cm.committed_wires, basis=basis,
            basis_exp_sigma=basis_sig, g2_sigma=g2_sigmas[ci],
            nb_public=cm.nb_public_committed))

    f2h = curve.host_g2_field
    pk = ProvingKey(
        curve=curve, domain_n=N,
        g1_a=_encode_affine_host(ffp, g1_A),
        g1_b=_encode_affine_host(ffp, g1_B),
        g1_z=_encode_affine_host(ffp, g1_Z),
        g1_k=_encode_affine_host(ffp, g1_pkK),
        g2_b=_encode_affine_host(ff2, g2_B),
        g1_alpha=g1_alpha, g1_beta=g1_beta, g1_delta=g1_delta,
        g2_beta=g2_beta, g2_delta=g2_delta,
        commitment_keys=commitment_keys,
    )
    pairing = get_pairing(curve_name)
    vk = VerifyingKey(
        curve=curve, g1_k=g1_vkK,
        g2_gamma_neg=host.ec_neg(f2h, g2_gamma),
        g2_delta_neg=host.ec_neg(f2h, g2_delta),
        e_alpha_beta=pairing.pair(g1_alpha, g2_beta),
        g1_alpha=g1_alpha, g2_beta=g2_beta, g2_gamma=g2_gamma,
        g2_delta=g2_delta,
        commitment_g2_sigma=[k.g2_sigma for k in commitment_keys],
        commitment_pac=_pac_indices(cs, nb_pub),
    )
    return pk, vk


import functools


@functools.lru_cache(maxsize=16)
def _compute_h_fn(field_name: str, N: int):
    """Fused computeH (prove.go:346-389): 3 iFFT + 3 coset-FFT +
    pointwise (a*b - c)*den + coset-iFFT + Montgomery-decode, ONE jit
    -> one device dispatch (each eager op over the axon tunnel costs
    ~0.3s of dispatch latency)."""
    from gnark_tpu.ntt import get_domain
    ffr = get_ff(field_name)
    dom = get_domain(ffr, N)

    @jax.jit
    def f(av, bv, cv, den_m):
        ac = dom.fft(dom.ifft(av), coset=True)
        bc = dom.fft(dom.ifft(bv), coset=True)
        cc = dom.fft(dom.ifft(cv), coset=True)
        hval = ffr.mul(ffr.sub(ffr.mul(ac, bc), cc), den_m)
        h = dom.ifft(hval, coset=True)
        return ffr.from_mont(h)         # plain limbs for MSM digits
    return f


@functools.partial(jax.jit, static_argnums=(0,))
def _to_affine_jit(f, P):
    return jac_to_affine(f, P)


@functools.lru_cache(maxsize=None)
def _g1_stage_fn(fr_name: str, fp_name: str, N: int, nb_pub: int,
                 nbits: int):
    """ONE dispatch for the whole G1 side of prove: computeH
    (3 iFFT + 3 coset-FFT + pointwise + coset-iFFT) feeding the four
    G1 MSMs (Ar, Bs1, Krs2, Krs) and a batched jacobian->affine
    (prove.go:187-305 task-parallel goroutines collapse into one XLA
    program; the tunnel's per-call latency made 7 eager dispatches the
    dominant prove cost)."""
    from gnark_tpu.ntt import get_domain
    ffr = get_ff(fr_name)
    ffp = get_ff(fp_name)
    dom = get_domain(ffr, N)

    @jax.jit
    def f(abc_raw, wire_raw, den_m, g1_a, g1_b, g1_z, g1_k):
        # raw u64-view inputs: limb split + Montgomery convert happen
        # IN-GRAPH (halves host->device bytes and removes 4 eager
        # to_mont dispatches at ~0.3s tunnel latency each)
        av = ffr.to_mont(ffr.limbs_from_u32(abc_raw[0]))
        bv = ffr.to_mont(ffr.limbs_from_u32(abc_raw[1]))
        cv = ffr.to_mont(ffr.limbs_from_u32(abc_raw[2]))
        wire_limbs = ffr.limbs_from_u32(wire_raw)
        ac = dom.fft(dom.ifft(av), coset=True)
        bc = dom.fft(dom.ifft(bv), coset=True)
        cc = dom.fft(dom.ifft(cv), coset=True)
        hval = ffr.mul(ffr.sub(ffr.mul(ac, bc), cc), den_m)
        h_plain = ffr.from_mont(dom.ifft(hval, coset=True))
        ar = msm(ffp, g1_a, wire_limbs, nbits)
        bs1 = msm(ffp, g1_b, wire_limbs, nbits)
        zp = tuple(a[: N - 1] for a in g1_z)
        krs2 = msm(ffp, zp, h_plain[: N - 1], nbits)
        krs = msm(ffp, g1_k, wire_limbs[nb_pub:], nbits)
        batch = tuple(jnp.stack(t) for t in zip(ar, bs1, krs2, krs))
        return jac_to_affine(ffp, batch)
    return f


@functools.lru_cache(maxsize=None)
def _g2_stage_fn(curve_name: str, fr_name: str, nbits: int):
    curve = curves_mod.CURVES[curve_name]
    ff2 = _g2_field(curve)
    ffr = get_ff(fr_name)

    @jax.jit
    def f(g2_b, wire_raw):
        wire_limbs = ffr.limbs_from_u32(wire_raw)
        r = msm(ff2, g2_b, wire_limbs, nbits)
        return jac_to_affine(ff2, _tup1(r))
    return f


def _g1_base(ffp, curve):
    return (jnp.asarray(ffp.encode(curve.g1[0])),
            jnp.asarray(ffp.encode(curve.g1[1])))


def _g2_base(ff2, curve):
    return (jnp.asarray(ff2.encode(curve.g2[0])),
            jnp.asarray(ff2.encode(curve.g2[1])))


# ---------------------------------------------------------------------------
# Prove
# ---------------------------------------------------------------------------

def prove(cs: ConstraintSystem, pk: ProvingKey, public, secret, rng=None,
          hint_overrides=None, recursion_friendly: bool = False,
          mesh=None, mesh_axis: str = "pts"):
    """mesh: optional jax.sharding.Mesh — every prover MSM is then
    sharded across `mesh_axis` (parallel/sharded.msm_sharded: per-chip
    Pippenger partials folded after an all-gather), the TPU-native
    analog of the reference's per-MSM NbTasks splitting
    (prove.go:187-305) scaled across chips."""
    curve = pk.curve
    q = curve.fr.modulus
    rnd = rng.randrange if rng is not None else \
        (lambda n: secrets.randbelow(n))

    # BSB22: override the commitment hint so the commitment wire value
    # binds to the real Pedersen commitment (prove.go:72-99)
    commitments = []
    poks = []
    f1 = curve.host_fp
    overrides = dict(hint_overrides or {})
    if pk.commitment_keys:
        ck_iter = iter(pk.commitment_keys)

        def _bsb22_override(qq, inputs):
            key = next(ck_iter)
            vals = [v % qq for v in inputs]
            hashed = vals[:key.nb_public]    # public-and-commitment
            priv = vals[key.nb_public:]      # Pedersen-committed
            C = host.ec_msm(f1, key.basis, priv)
            pok = host.ec_msm(f1, key.basis_exp_sigma, priv)
            commitments.append(C)
            poks.append(pok)
            cm_vals.append(_hash_to_field(curve, C, recursion_friendly,
                                          public_committed=hashed))
            return [cm_vals[-1]]

        cm_vals: list = []
        overrides["bsb22"] = _bsb22_override

    import time as _time

    from gnark_tpu.logger import get_logger
    _log = get_logger()
    _t0 = _time.perf_counter()

    def _mark(what):
        nonlocal _t0
        t = _time.perf_counter()
        _log.debug("prove phase %-12s %.3fs", what, t - _t0)
        _t0 = t

    sol = solve_auto(cs, public, secret, hint_overrides=overrides)
    _mark("solve")
    N = pk.domain_n
    ffr = get_ff(curve.fr.name)
    ffp = get_ff(curve.fp.name)
    ff2 = _g2_field(curve)

    # --- computeH on device (prove.go:346-389) ---
    pad = N - len(sol.a)
    abc_u64 = getattr(sol, "abc_u64", None)
    nl = (curve.fr.bits + 63) // 64
    if abc_u64 is not None and len(sol.a) == abc_u64.shape[1]:
        zp = np.zeros((3, pad, abc_u64.shape[2]), dtype=np.uint64)
        abc_p = np.concatenate([abc_u64, zp], axis=1) if pad else abc_u64
    else:
        abc_p = np.zeros((3, N, nl), dtype=np.uint64)
        m64 = (1 << 64) - 1
        for j, col in enumerate((sol.a, sol.b, sol.c)):
            for i, v in enumerate(col):
                for li in range(nl):
                    abc_p[j, i, li] = (v >> (64 * li)) & m64
    # raw u64 views: half the upload bytes of 16-bit limb arrays;
    # limb split + to-Montgomery run inside the fused stage jit
    abc_raw = ffr.u64_view(abc_p)
    den = pow(pow(curve.fr.generator, N, q) - 1, -1, q)
    den_m = jnp.asarray(ffr.encode([den]))

    vals_u64 = getattr(sol, "values_u64", None)
    if vals_u64 is None:
        vals_u64 = np.zeros((len(sol.values), nl), dtype=np.uint64)
        m64 = (1 << 64) - 1
        for i, v in enumerate(sol.values):
            for li in range(nl):
                vals_u64[i, li] = (v >> (64 * li)) & m64
    wire_raw = ffr.u64_view(vals_u64)
    wire_limbs = None                     # built lazily for mesh path
    nbits = curve.fr.bits

    if mesh is None:
        # fused single-dispatch G1 side + single-dispatch G2 side
        g1_aff = _decode_affine(ffp, _g1_stage_fn(
            curve.fr.name, curve.fp.name, N, cs.nb_public, nbits)(
            abc_raw, wire_raw, den_m, pk.g1_a, pk.g1_b,
            pk.g1_z, pk.g1_k))
        ar_m, bs1_m, krs2_m, krs_m = g1_aff
        _mark("computeH+G1 msm")
        bs2_m = _decode_affine(ff2, _g2_stage_fn(
            curve.name, curve.fr.name, nbits)(pk.g2_b, wire_raw))[0]
        _mark("G2 msm")
    else:
        from gnark_tpu.parallel import msm_sharded

        def _msm(f, pts, sc, nb):
            # pad to a multiple of the mesh axis with infinity points
            x_, y_, inf_ = pts
            ndev = mesh.shape[mesh_axis]
            padn = -x_.shape[0] % ndev
            if padn:
                x_ = jnp.concatenate(
                    [x_, jnp.zeros((padn,) + x_.shape[1:], x_.dtype)])
                y_ = jnp.concatenate(
                    [y_, jnp.zeros((padn,) + y_.shape[1:], y_.dtype)])
                inf_ = jnp.concatenate(
                    [inf_, jnp.ones((padn,), bool)])
                sc = jnp.concatenate(
                    [sc, jnp.zeros((padn, sc.shape[1]), sc.dtype)])
            return msm_sharded(f, (x_, y_, inf_), sc, nb, mesh,
                               axis=mesh_axis)

        av = ffr.to_mont(ffr.limbs_from_u32(jnp.asarray(abc_raw[0])))
        bv = ffr.to_mont(ffr.limbs_from_u32(jnp.asarray(abc_raw[1])))
        cv = ffr.to_mont(ffr.limbs_from_u32(jnp.asarray(abc_raw[2])))
        wire_limbs = ffr.limbs_from_u32(jnp.asarray(wire_raw))
        h_plain = _compute_h_fn(curve.fr.name, N)(av, bv, cv, den_m)
        _mark("computeH")
        ar_j = _msm(ffp, pk.g1_a, wire_limbs, nbits)
        bs1_j = _msm(ffp, pk.g1_b, wire_limbs, nbits)
        bs2_j = _msm(ff2, pk.g2_b, wire_limbs, nbits)
        # deg(H) = n-2: last Z point unused (prove.go:221 sizeH)
        z_pts = tuple(a[: N - 1] for a in pk.g1_z)
        krs2_j = _msm(ffp, z_pts, h_plain[: N - 1], nbits)
        priv_limbs = wire_limbs[cs.nb_public:]
        krs_j = _msm(ffp, pk.g1_k, priv_limbs, nbits)
        jax.block_until_ready((ar_j, bs1_j, bs2_j, krs2_j, krs_j))
        _mark("msm x5")
        g1_batch = tuple(jnp.stack([a, b, c, d])
                         for a, b, c, d in zip(ar_j, bs1_j, krs2_j,
                                               krs_j))
        g1_aff = _decode_affine(ffp, _to_affine_jit(ffp, g1_batch))
        ar_m, bs1_m, krs2_m, krs_m = g1_aff
        bs2_m = _decode_affine(ff2, _to_affine_jit(ff2,
                                                   _tup1(bs2_j)))[0]
        _mark("to_affine")

    # --- host combination (tiny) ---
    f2h = curve.host_g2_field
    r, s = rnd(q), rnd(q)
    ar = host.ec_add(f1, host.ec_add(f1, ar_m, pk.g1_alpha),
                     host.ec_mul(f1, pk.g1_delta, r))
    bs1 = host.ec_add(f1, host.ec_add(f1, bs1_m, pk.g1_beta),
                      host.ec_mul(f1, pk.g1_delta, s))
    bs = host.ec_add(f2h, host.ec_add(f2h, bs2_m, pk.g2_beta),
                     host.ec_mul(f2h, pk.g2_delta, s))
    krs = host.ec_add(f1, krs_m, krs2_m)
    krs = host.ec_add(f1, krs, host.ec_mul(f1, pk.g1_delta, (-r * s) % q))
    krs = host.ec_add(f1, krs, host.ec_mul(f1, ar, s))
    krs = host.ec_add(f1, krs, host.ec_mul(f1, bs1, r))
    if poks and not recursion_friendly:
        # fold the PoKs into one like gnark (prove.go:110-128):
        # challenge = fr.Hash(commitment wire values, "G16-BSB22"),
        # CommitmentPok = sum challenge^i * pok_i
        from gnark_tpu.backend import gnark_fs
        ch = gnark_fs.groth16_fold_challenge(cm_vals, q)
        acc, cp = host.INF, 1
        for pok in poks:
            acc = host.ec_add(f1, acc, host.ec_mul(f1, pok, cp))
            cp = cp * ch % q
        poks = [acc]
    return Proof(ar=ar, krs=krs, bs=bs, commitments=commitments, poks=poks)


def _tup1(P):
    """Jacobian point with batch shape () -> batch shape (1,)."""
    return tuple(a[None] for a in P)


# ---------------------------------------------------------------------------
# Verify
# ---------------------------------------------------------------------------

def verify(proof: Proof, vk: VerifyingKey, public_values,
           recursion_friendly: bool = False) -> bool:
    """e(Ar, Bs) == e(alpha, beta) * e(kSum, gamma) * e(Krs, delta),
    checked as FE(ML(Krs,-d)*ML(Ar,Bs)*ML(kSum,-g)) == vk.e
    (verify.go:70-143); commitment-wire values recomputed from the
    proof's Pedersen commitments, PoKs pairing-checked."""
    curve = vk.curve
    q = curve.fr.modulus
    nb_cm = len(vk.commitment_g2_sigma)
    if len(proof.commitments) != nb_cm:
        return False
    # gnark proofs carry ONE folded PoK (marshal.go Ar|Bs|Krs|
    # Commitments|CommitmentPok); recursion_friendly proofs keep
    # per-commitment PoKs for the in-circuit verifier
    if len(proof.poks) != (min(nb_cm, 1) if not recursion_friendly
                           else nb_cm):
        return False
    # untrusted-point hardening: on-curve + subgroup for every proof
    # point before any pairing (gnark enforces this on unmarshal)
    if not host.validate_points(
            curve,
            g1_points=[proof.ar, proof.krs] + list(proof.commitments)
            + list(proof.poks),
            g2_points=[proof.bs]):
        return False
    if len(public_values) != len(vk.g1_k) - 1 - nb_cm:
        raise ValueError(
            f"want {len(vk.g1_k) - 1 - nb_cm} public values, "
            f"got {len(public_values)}")
    f1 = curve.host_fp
    # recompute commitment wire values and extend the public vector;
    # hashed public-committed values resolve against the growing
    # extended vector (verify.go:85-103 solveCommitmentWire)
    extended = [v % q for v in public_values]
    pac = list(vk.commitment_pac or [()] * nb_cm)
    for ci, C in enumerate(proof.commitments):
        pac_vals = [extended[i - 1] for i in pac[ci]]
        extended.append(_hash_to_field(curve, C, recursion_friendly,
                                       public_committed=pac_vals))
    ksum = vk.g1_k[0]
    for v, pt in zip(extended, vk.g1_k[1:]):
        ksum = host.ec_add(f1, ksum, host.ec_mul(f1, pt, v % q))
    for C in proof.commitments:
        ksum = host.ec_add(f1, ksum, C)

    pairing = get_pairing(curve.name)
    f2h = curve.host_g2_field
    if recursion_friendly:
        # per-commitment PoKs: e(pok, g2) == e(C, sigma*g2)
        pok_pairs = [p for C, pok, g2s in
                     zip(proof.commitments, proof.poks,
                         vk.commitment_g2_sigma)
                     for p in ((pok, host.ec_neg(f2h, curve.g2)),
                               (C, g2s))]
    elif nb_cm:
        # folded multi-vk check (verify.go:104-113 +
        # pedersen.BatchVerifyMultiVk): with gamma the G16-BSB22
        # challenge over the commitment wire values,
        # e(-fold(pok), g2) * prod e(gamma^i C_i, sigma_i) == 1
        from gnark_tpu.backend import gnark_fs
        ch = gnark_fs.groth16_fold_challenge(extended[-nb_cm:], q)
        pok_pairs = [(host.ec_neg(f1, proof.poks[0]), curve.g2)]
        cp = 1
        for C, g2s in zip(proof.commitments, vk.commitment_g2_sigma):
            pok_pairs.append((host.ec_mul(f1, C, cp), g2s))
            cp = cp * ch % q
    else:
        pok_pairs = []
    if pok_pairs:
        chk = pairing.pairing_product(pok_pairs)
        if not pairing.ext.eq(chk, pairing.gt_one()):
            return False
    res = pairing.pairing_product([
        (proof.krs, vk.g2_delta_neg),
        (proof.ar, proof.bs),
        (ksum, vk.g2_gamma_neg),
    ])
    return pairing.ext.eq(res, vk.e_alpha_beta)


def dummy_setup(cs: ConstraintSystem, curve_name: str):
    """Fast fake ProvingKey for benchmarking the prover without a real
    ceremony (reference groth16.DummySetup / DummyInfinitySetup,
    backend/groth16/groth16.go:217-240): every column point is a fixed
    small multiple of the generator, so Setup cost is O(1) host work +
    one upload instead of the giant batch scalar-mul. Proofs made with
    it do NOT verify."""
    curve = curves_mod.CURVES[curve_name]
    assert curve.fr.modulus == cs.q
    nb_wires = cs.nb_wires
    nb_pub = cs.nb_public
    N = _next_pow2(max(cs.nb_constraints, 1))
    ffp = get_ff(curve.fp.name)
    ff2 = _g2_field(curve)
    g = curve.g1
    g2pt = curve.g2

    def _tiled(ff, pt, n):
        # encode ONE point, tile on host — a per-element python encode
        # of 2^20 identical rows costs ~a minute, np.tile is free
        one = _encode_affine_host(ff, [pt])
        return tuple(
            jnp.asarray(np.tile(np.asarray(a), (n,) + (1,) * (a.ndim - 1)))
            for a in one)

    enc = _tiled(ffp, g, nb_wires)
    enc2 = _tiled(ff2, g2pt, nb_wires)
    encz = _tiled(ffp, g, N)
    enck = _tiled(ffp, g, max(nb_wires - nb_pub, 1))
    return ProvingKey(
        curve=curve, domain_n=N,
        g1_a=enc, g1_b=enc, g1_z=encz, g1_k=enck, g2_b=enc2,
        g1_alpha=g, g1_beta=g, g1_delta=g,
        g2_beta=g2pt, g2_delta=g2pt, commitment_keys=[])
