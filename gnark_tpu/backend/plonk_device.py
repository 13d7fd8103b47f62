"""Device-resident PLONK prover pipeline.

The reference prover is a 9-stage goroutine pipeline over gnark-crypto
CPU kernels (backend/plonk/bn254/prove.go:98-153). This is the
TPU-native re-design: every O(N) polynomial operation — column build,
basis changes, the Z ratio cumulative product, the quotient numerator,
evaluations at zeta, the linearized polynomial and both KZG opening
quotients — runs as device kernels over Montgomery limb arrays; the
host only sequences Fiat-Shamir challenges and handles O(1) scalars
(blinding factors, claimed values).

Key device formulations (vs the reference's loops):

  * columns: numpy gather over the solver's zero-copy u64 witness +
    one bulk Montgomery encode (no per-element Python)
  * Z accumulator (prove.go:635 BuildRatioCopyConstraint): ratios
    r_k = num_k * den_k^-1 via one batched inversion, then the
    cumulative product as a jax.lax.associative_scan over field mul —
    O(N log N) muls but fully parallel (the reference's sequential
    O(N) loop is hostile to wide hardware)
  * quotient (prove.go:841-1128): coset-evaluate all columns on the
    4N domain (or rho-pass over N-sized shifts for memory) and fuse
    gate+permutation+L1 elementwise; division by Z_H is a periodic
    constant multiply
  * KZG openings: instead of sequential synthetic division, evaluate
    the folded polynomial on a 2N domain, divide pointwise by (x - z)
    with a batched inverse, and iFFT back — the standard
    evaluate-and-divide identity (p(X)-p(z))/(X-z)
  * polynomial evaluations at zeta: powers-of-zeta vector (scan) +
    one multiply + log-N tree reduction

Proof bytes are identical to backend/plonk.py's semantics: same
transcripts (gnark-bit-exact default / MiMC recursion_friendly), same
blinding structure (1,1,1,2 + StatisticalZK randomizers), same claimed
value ordering.
"""

from __future__ import annotations

import secrets

import jax
import jax.numpy as jnp
import numpy as np

from gnark_tpu.backend import kzg as kzg_mod
from gnark_tpu.constraint import solve_auto
from gnark_tpu.ec import host
from gnark_tpu.ff import get_ff
from gnark_tpu.ntt import get_domain


# ---------------------------------------------------------------------------
# device helpers
# ---------------------------------------------------------------------------

def dev_powers(ff, base: int, n: int):
    """[1, b, b^2, ..., b^(n-1)] as Montgomery device array via an
    associative scan (log n depth)."""
    q = ff.p.modulus
    b = jnp.asarray(ff.encode([1] + [base % q] * (n - 1)))
    return jax.lax.associative_scan(ff.mul, b, axis=0)


def ff_sum(ff, a):
    """Tree-sum a (n, L) field array -> (L,). Pads to a power of two
    with zeros (the additive identity in Montgomery form too)."""
    n = a.shape[0]
    m = 1 << (n - 1).bit_length() if n > 1 else 1
    if m != n:
        a = jnp.pad(a, ((0, m - n), (0, 0)))
    while m > 1:
        half = m // 2
        a = ff.add(a[:half], a[half:m])
        m = half
    return a[0]


def dev_poly_eval(ff, coeffs_dev, zpows) -> int:
    """Evaluate Montgomery device coeffs at z given a powers-of-z
    vector (>= len(coeffs)); returns a host int."""
    n = coeffs_dev.shape[0]
    s = ff_sum(ff, ff.mul(coeffs_dev, zpows[:n]))
    return int(ff.decode(np.asarray(s)[None, :])[0])


def dev_lincomb(ff, polys, scalars, out_len=None):
    """sum_i scalars[i] * polys[i] over device Montgomery coeff arrays
    (host int scalars), zero-padded to the longest (or out_len)."""
    q = ff.p.modulus
    m = max(p.shape[0] for p in polys)
    if out_len is not None:
        m = max(m, out_len)
    acc = None
    for p, s in zip(polys, scalars):
        if p.shape[0] < m:
            p = jnp.pad(p, ((0, m - p.shape[0]), (0, 0)))
        t = ff.mul(p, jnp.asarray(ff.encode([s % q]))) \
            if s != 1 else p
        acc = t if acc is None else ff.add(acc, t)
    return acc


class _DevDomain:
    """Cached per-(field, n) device data for the open-by-evaluation
    trick: domain points and their encode."""

    _cache: dict = {}

    @classmethod
    def get(cls, ff, n):
        key = (ff.p.name, n)
        if key not in cls._cache:
            dom = get_domain(ff, n)
            xs = dev_powers(ff, dom.omega, n)
            cls._cache[key] = (dom, xs)
        return cls._cache[key]


def open_quotient_dev(ff, dom_n2, xs, coeffs_dev, z: int, claimed: int):
    """(p(X) - p(z)) / (X - z) coefficients on device.

    coeffs_dev: Montgomery device coeffs, len <= n2 = 2N. Evaluates p
    on the n2 domain, subtracts the claimed value, multiplies by
    batch-inverted (x_i - z) and iFFTs back."""
    q = ff.p.modulus
    n2 = xs.shape[0]
    c = jnp.pad(coeffs_dev, ((0, n2 - coeffs_dev.shape[0]), (0, 0)))
    evals = dom_n2.fft(c)
    z_d = jnp.broadcast_to(jnp.asarray(ff.encode([z % q])), xs.shape)
    v_d = jnp.broadcast_to(jnp.asarray(ff.encode([claimed % q])),
                           xs.shape)
    quot = ff.mul(ff.sub(evals, v_d), ff.batch_inv(ff.sub(xs, z_d)))
    return dom_n2.ifft(quot)


def commit_dev(srs: kzg_mod.SRS, coeffs_mont, max_len=None):
    """KZG-commit Montgomery device coeffs -> host affine point."""
    ff = get_ff(srs.curve.fr.name)
    c = coeffs_mont if max_len is None else coeffs_mont[:max_len]
    plain = ff.from_mont(c)
    from gnark_tpu.backend.groth16 import _decode_affine, _tup1
    from gnark_tpu.ec.weierstrass import jac_to_affine
    R = kzg_mod.commit_device(srs, plain)
    ffp = get_ff(srs.curve.fp.name)
    return _decode_affine(ffp, jac_to_affine(ffp, _tup1(R)))[0]


def _encode_col_u64(ff, values_u64, idx):
    """Gather witness values (u64 limb rows) at wire indexes and bulk
    Montgomery-encode — the zero-copy path (no Python ints)."""
    return ff.encode_u64(np.ascontiguousarray(values_u64[idx]),
                         mont=True)


# ---------------------------------------------------------------------------
# prove
# ---------------------------------------------------------------------------

def prove(cs, pk, public, secret, rng=None, hint_overrides=None,
          recursion_friendly: bool = False,
          statistical_zk: bool = False):
    from gnark_tpu.backend import plonk as P

    vk = pk.vk
    curve = vk.curve
    q = curve.fr.modulus
    N = vk.size
    w = vk.generator
    u = vk.coset_shift
    rnd = rng.randrange if rng is not None else \
        (lambda n: secrets.randbelow(n))
    nb_pub = cs.nb_public
    ffr = get_ff(curve.fr.name)
    dom = get_domain(ffr, N)

    import time as _time
    from gnark_tpu.logger import get_logger
    _log = get_logger()
    _t0 = _time.perf_counter()

    def _mark(what):
        nonlocal _t0
        t = _time.perf_counter()
        _log.debug("plonk prove %-14s %.3fs", what, t - _t0)
        _t0 = t

    # --- BSB22 commit hint (prove.go:268-311) ------------------------------
    bsb22_pts: list = []
    bsb22_vals: list = []
    pi2_dev: list = []         # pi2 canonical coeffs (device, mont)

    def _bsb22_prove_hint(q_, ins):
        i = len(bsb22_pts)
        cm = cs.commitments[i]
        col = [0] * N
        for row, v in zip(cm.committed_rows, ins):
            col[nb_pub + row] = v % q
        col[nb_pub + cm.commitment_row] = rnd(q)
        col[nb_pub + cs.nb_constraints - 1] = rnd(q)
        c_dev = dom.ifft(jnp.asarray(ffr.encode(col)))
        pt = commit_dev(pk.srs, c_dev)
        val = P._h2f_bsb22(curve, pt, recursion_friendly)
        bsb22_pts.append(pt)
        bsb22_vals.append(val)
        pi2_dev.append(c_dev)
        return [val]

    overrides = dict(hint_overrides or {})
    if cs.commitments:
        overrides["bsb22"] = _bsb22_prove_hint

    sol = solve_auto(cs, public, secret, hint_overrides=overrides)
    _mark("solve")
    publics = sol.values[:nb_pub]

    # --- L, R, O device columns (solver.go:150-170 layout) ------------------
    vals_u64 = getattr(sol, "values_u64", None)
    idx = _col_indexes(cs, N)
    if vals_u64 is not None:
        Lc = _encode_col_u64(ffr, vals_u64, idx[0])
        Rc = _encode_col_u64(ffr, vals_u64, idx[1])
        Oc = _encode_col_u64(ffr, vals_u64, idx[2])
    else:
        v = sol.values
        Lc = ffr.encode([v[i] for i in idx[0]])
        Rc = ffr.encode([v[i] for i in idx[1]])
        Oc = ffr.encode([v[i] for i in idx[2]])
    L_dev = jnp.asarray(Lc)
    R_dev = jnp.asarray(Rc)
    O_dev = jnp.asarray(Oc)

    dev = _pk_dev(pk, ffr)

    # complete qk: public inputs + commitment challenges (completeQk)
    qk_rows = list(range(nb_pub)) + \
        [nb_pub + cm.commitment_row for cm in cs.commitments]
    qk_vals = [v % q for v in publics] + [v % q for v in bsb22_vals]
    qk_dev = dev["qk_lag"].at[jnp.asarray(qk_rows, dtype=jnp.int32)].set(
        jnp.asarray(ffr.encode(qk_vals)))
    qkc_dev = dom.ifft(qk_dev)

    l_c = dom.ifft(L_dev)
    r_c = dom.ifft(R_dev)
    o_c = dom.ifft(O_dev)
    _mark("columns+ifft")

    # --- blinding (orders 1,1,1,2 — prove.go:71-76) -------------------------
    def blind_ff(coeffs_dev, order):
        b = [rnd(q) for _ in range(order + 1)]
        m = N + order + 1
        out = jnp.pad(coeffs_dev, ((0, m - coeffs_dev.shape[0]), (0, 0)))
        add_vec = [0] * m
        for i, bv in enumerate(b):
            add_vec[i] = (add_vec[i] - bv) % q
            add_vec[N + i] = (add_vec[N + i] + bv) % q
        return ff_sparse_add(ffr, out, add_vec)

    def ff_sparse_add(ff, dev_arr, host_vec):
        nz = [(i, v) for i, v in enumerate(host_vec) if v]
        if not nz:
            return dev_arr
        ii = jnp.asarray([i for i, _ in nz], dtype=jnp.int32)
        vv = jnp.asarray(ff.encode([v for _, v in nz]))
        upd = ff.add(dev_arr[ii], vv)
        return dev_arr.at[ii].set(upd)

    l_b = blind_ff(l_c, 1)
    r_b = blind_ff(r_c, 1)
    o_b = blind_ff(o_c, 1)

    c_l = commit_dev(pk.srs, l_b)
    c_r = commit_dev(pk.srs, r_b)
    c_o = commit_dev(pk.srs, o_b)
    _mark("commit LRO")

    # --- gamma, beta ---------------------------------------------------------
    ts = P._new_transcript(vk, recursion_friendly)
    P._bind_public_data(ts, vk, publics)
    p_mod = curve.fp.modulus
    for pt in (c_l, c_r, c_o):
        ts.bind("gamma", ts.point_bytes(pt, p_mod))
    gamma = ts.challenge("gamma")
    beta = ts.challenge("beta")

    # --- Z ratio cumulative product (device) --------------------------------
    z_lag = _z_column(ffr, dom, L_dev, R_dev, O_dev, dev, beta, gamma,
                      u, N)
    z_c = dom.ifft(z_lag)
    z_b = blind_ff(z_c, 2)
    c_z = commit_dev(pk.srs, z_b)
    _mark("Z")

    for pt in bsb22_pts:
        ts.bind("alpha", ts.point_bytes(pt, p_mod))
    ts.bind("alpha", ts.point_bytes(c_z, p_mod))
    alpha = ts.challenge("alpha")

    # --- quotient ------------------------------------------------------------
    N4 = 4 * N if N >= 6 else 8 * N
    dom4 = get_domain(ffr, N4)
    g = curve.fr.generator % q
    w4 = dom4.omega
    period = N4 // N
    alpha2 = alpha * alpha % q
    Ninv = pow(N, -1, q)

    # Z(wX)
    zs_b = ff_scale_powers(ffr, z_b, w, q)

    col_coeffs = dict(l=l_b, r=r_b, o=o_b, z=z_b, zs=zs_b,
                      ql=dev["ql_c"], qr=dev["qr_c"], qm=dev["qm_c"],
                      qo=dev["qo_c"], s1=dev["s1_c"], s2=dev["s2_c"],
                      s3=dev["s3_c"])

    import os as _os
    rho_log = int(_os.environ.get("GNARK_TPU_PLONK_RHO_LOG", "18"))
    use_rho = N >= (1 << rho_log) and period > 1

    scalars = dict(q=q, beta=beta, gamma=gamma, alpha=alpha,
                   alpha2=alpha2, u=u, Ninv=Ninv)

    if not use_rho:
        def on_coset(cdev):
            c = jnp.pad(cdev, ((0, N4 - cdev.shape[0]), (0, 0)))
            return dom4.fft(c, coset=True)

        cols = {k: on_coset(v) for k, v in col_coeffs.items()}
        qkx = on_coset(qkc_dev)
        for qcp_c, pi2_c in zip(dev["qcp_c"], pi2_dev):
            qkx = ffr.add(qkx, ffr.mul(on_coset(qcp_c),
                                       on_coset(pi2_c)))
        cols["qk"] = qkx
        gN = pow(g, N, q)
        w4N = pow(w4, N, q)
        zh_vals = [(gN * pow(w4N, i, q) - 1) % q for i in range(period)]
        zh_inv4 = [pow(v, -1, q) for v in zh_vals]
        xd = ffr.mul(dev_powers(ffr, w4, N4),
                     jnp.asarray(ffr.encode([g])))
        zh_d = jnp.asarray(ffr.encode(
            [zh_vals[i % period] for i in range(N4)]))
        zhi_d = jnp.asarray(ffr.encode(
            [zh_inv4[i % period] for i in range(N4)]))
        numd = _numerator(ffr, cols, xd, zh_d, zhi_d, N4, scalars)
        h_dev = dom4.ifft(numd, coset=True)
    else:
        # rho-pass (computeNumerator prove.go:936-1020): evaluate the
        # numerator shift-by-shift on N-sized blocks, fully on device
        chunks = []
        wp_dev = dev_powers(ffr, w, N)
        for sshift in range(period):
            shift = g * pow(w4, sshift, q) % q
            cN = pow(shift, N, q)
            spows = dev_powers(ffr, shift, N)

            def eval_shift(cdev, _spows=spows, _cN=cN):
                # fold deg<kN blocks: sum_b coeffs[bN+i] * cN^b, then
                # scale by shift^i and FFT on the plain domain
                m = cdev.shape[0]
                blocks = -(-m // N)
                c = jnp.pad(cdev, ((0, blocks * N - m), (0, 0)))
                c = c.reshape(blocks, N, -1)
                acc = c[0]
                cp = 1
                for b in range(1, blocks):
                    cp = cp * _cN % q
                    acc = ffr.add(acc, ffr.mul(
                        c[b], jnp.asarray(ffr.encode([cp]))))
                return dom.fft(ffr.mul(acc, _spows))

            cols = {k: eval_shift(v) for k, v in col_coeffs.items()}
            qkx = eval_shift(qkc_dev)
            for qcp_c, pi2_c in zip(dev["qcp_c"], pi2_dev):
                qkx = ffr.add(qkx, ffr.mul(eval_shift(qcp_c),
                                           eval_shift(pi2_c)))
            cols["qk"] = qkx
            xd = ffr.mul(wp_dev, jnp.asarray(ffr.encode([shift])))
            zh_c = (cN - 1) % q
            zhi_c = pow(zh_c, -1, q)
            zh_d = jnp.broadcast_to(
                jnp.asarray(ffr.encode([zh_c])), xd.shape)
            zhi_d = jnp.broadcast_to(
                jnp.asarray(ffr.encode([zhi_c])), xd.shape)
            chunks.append(np.asarray(
                _numerator(ffr, cols, xd, zh_d, zhi_d, N, scalars)))
        inter = np.stack(chunks, axis=1).reshape(N4, -1)
        h_dev = dom4.ifft(jnp.asarray(inter), coset=True)
    _mark("quotient")

    # h splits into 3 shards of N+2 (deg H = 3N+5)
    shard = N + 2
    h0 = h_dev[:shard]
    h1 = h_dev[shard:2 * shard]
    h2 = h_dev[2 * shard:3 * shard]
    if __debug__:
        tail = np.asarray(h_dev[3 * shard:])
        assert not tail.any() or bool(
            np.all(ffr.decode(tail) == 0)), "quotient degree bound"
    if statistical_zk:
        b1, b2 = rnd(q), rnd(q)
        h0 = jnp.pad(h0, ((0, 1), (0, 0)))
        h1 = jnp.pad(h1, ((0, 1), (0, 0)))

        def sp(dev_arr, at, v):
            vv = jnp.asarray(ffr.encode([v % q]))
            return dev_arr.at[at].set(ffr.add(dev_arr[at], vv[0]))

        h0 = sp(h0, shard, b1)
        h1 = sp(h1, 0, q - b1)
        h1 = sp(h1, shard, b2)
        h2 = sp(h2, 0, q - b2)
    c_h0 = commit_dev(pk.srs, h0)
    c_h1 = commit_dev(pk.srs, h1)
    c_h2 = commit_dev(pk.srs, h2)
    _mark("commit H")

    for pt in (c_h0, c_h1, c_h2):
        ts.bind("zeta", ts.point_bytes(pt, p_mod))
    zeta = ts.challenge("zeta")

    # --- evaluations at zeta (device powers + tree sums) ---------------------
    maxlen = max(N + 3, shard + 1)
    zpows = dev_powers(ffr, zeta, maxlen)
    lz = dev_poly_eval(ffr, l_b, zpows)
    rz = dev_poly_eval(ffr, r_b, zpows)
    oz = dev_poly_eval(ffr, o_b, zpows)
    s1z = dev_poly_eval(ffr, dev["s1_c"], zpows)
    s2z = dev_poly_eval(ffr, dev["s2_c"], zpows)
    qcpz = [dev_poly_eval(ffr, c, zpows) for c in dev["qcp_c"]]
    wzeta = w * zeta % q
    zu = dev_poly_eval(ffr, z_b,
                       dev_powers(ffr, wzeta, z_b.shape[0]))

    zeta_n = pow(zeta, N, q)
    zh_zeta = (zeta_n - 1) % q
    l1_zeta = zh_zeta * pow((zeta - 1) % q, -1, q) % q * Ninv % q
    a2l1 = alpha2 * l1_zeta % q

    t1 = (lz + beta * s1z + gamma) % q
    t2 = (rz + beta * s2z + gamma) % q
    _s1 = alpha * beta % q * t1 % q * t2 % q * zu % q
    idp = (lz + beta * zeta + gamma) % q
    idp = idp * ((rz + beta * u % q * zeta + gamma) % q) % q
    idp = idp * ((oz + beta * u % q * u % q * zeta + gamma) % q) % q
    coeff_z = (a2l1 - alpha * idp) % q

    rl = lz * rz % q
    zp2 = pow(zeta, N + 2, q)
    zh = (q - zh_zeta) % q

    # NB: the INCOMPLETE qk (public contributions live in the
    # verifier's PI term, not the linearized polynomial)
    lin_polys = [dev["ql_c"], dev["qr_c"], dev["qm_c"], dev["qo_c"],
                 dev["qk_c"]] + pi2_dev + [dev["s3_c"], z_b,
                                           h0, h1, h2]
    lin_scals = [lz, rz, rl, oz, 1] + qcpz + [
        _s1, coeff_z, zh, zh * zp2 % q, zh * zp2 % q * zp2 % q]
    lin = dev_lincomb(ffr, lin_polys, lin_scals)
    lin_zeta = dev_poly_eval(ffr, lin, zpows)
    _mark("evals+lin")

    # --- openings (evaluate-and-divide on the 2N domain) ---------------------
    n2 = 2 * N if 2 * N >= lin.shape[0] else 4 * N
    dom2, xs2 = _DevDomain.get(ffr, n2)

    zq = open_quotient_dev(ffr, dom2, xs2, z_b, wzeta, zu)
    z_open_h = commit_dev(pk.srs, zq, max_len=z_b.shape[0])

    lin_digest = P._lin_digest_prover(
        pk, vk, c_z, (c_h0, c_h1, c_h2), lz, rz, oz, _s1, coeff_z,
        zh_zeta, zp2, bsb22_pts, qcpz)
    digests = [lin_digest, c_l, c_r, c_o, vk.s_comm[0], vk.s_comm[1]] \
        + list(vk.qcp_c)
    claimed = [lin_zeta, lz, rz, oz, s1z, s2z] + qcpz
    fold_ch = P._fold_challenge(vk, digests, zeta, zu, claimed,
                                recursion_friendly)

    open_polys = [lin, l_b, r_b, o_b, dev["s1_c"], dev["s2_c"]] \
        + list(dev["qcp_c"])
    chp = 1
    fold_scals = []
    for _ in open_polys:
        fold_scals.append(chp)
        chp = chp * fold_ch % q
    folded = dev_lincomb(ffr, open_polys, fold_scals)
    folded_claim = 0
    for v, s in zip(claimed, fold_scals):
        folded_claim = (folded_claim + v * s) % q
    bq = open_quotient_dev(ffr, dom2, xs2, folded, zeta, folded_claim)
    batch_h = commit_dev(pk.srs, bq, max_len=folded.shape[0])
    _mark("openings")

    return P.PlonkProof(lro=[c_l, c_r, c_o], z=c_z,
                        h=[c_h0, c_h1, c_h2],
                        batched_h=batch_h, claimed=claimed,
                        z_shift_h=z_open_h, zu=zu, bsb22=bsb22_pts)


def ff_scale_powers(ff, coeffs_dev, w: int, q: int):
    """coeffs[i] * w^i (Z(wX) shift) on device."""
    n = coeffs_dev.shape[0]
    return ff.mul(coeffs_dev, dev_powers(ff, w, n))


def _z_column(ffr, dom, L_dev, R_dev, O_dev, dev, beta, gamma, u, N):
    """Z Lagrange column: Z[0]=1, Z[k+1] = Z[k] * num_k / den_k
    where num/den are the id/sigma permutation products."""
    q = ffr.p.modulus

    def c(v):
        return jnp.asarray(ffr.encode([v % q]))

    wpow = dev["wpow"]
    bx = ffr.mul(c(beta), wpow)
    g_d = jnp.broadcast_to(c(gamma), L_dev.shape)
    nm = ffr.add(ffr.add(L_dev, bx), g_d)
    nm = ffr.mul(nm, ffr.add(ffr.add(R_dev, ffr.mul(c(u), bx)), g_d))
    nm = ffr.mul(nm, ffr.add(
        ffr.add(O_dev, ffr.mul(c(u * u % q), bx)), g_d))
    beta_d = c(beta)
    dn = ffr.add(ffr.add(L_dev, ffr.mul(beta_d, dev["s1_v"])), g_d)
    dn = ffr.mul(dn, ffr.add(
        ffr.add(R_dev, ffr.mul(beta_d, dev["s2_v"])), g_d))
    dn = ffr.mul(dn, ffr.add(
        ffr.add(O_dev, ffr.mul(beta_d, dev["s3_v"])), g_d))
    ratio = ffr.mul(nm, ffr.batch_inv(dn))
    # Z = [1, r0, r0r1, ...]: shift the inclusive scan right by one
    scan = jax.lax.associative_scan(ffr.mul, ratio, axis=0)
    one = jnp.asarray(ffr.encode([1]))
    return jnp.concatenate([one, scan[: N - 1]], axis=0)


def _numerator(ff, cols, xd, zh_d, zhi_d, n_pts, s):
    """Fused gate + copy-ordering + L1 numerator, elementwise
    (identical math to the reference's computeNumerator closures,
    prove.go:1040-1106)."""
    q = s["q"]

    def dc(v):
        one = ff.encode([v % q])
        return jnp.broadcast_to(jnp.asarray(one),
                                (n_pts,) + one.shape[1:])
    one_d = dc(1)
    gamma_d = dc(s["gamma"])
    gate = ff.add(ff.mul(cols["ql"], cols["l"]),
                  ff.mul(cols["qr"], cols["r"]))
    gate = ff.add(gate, ff.mul(cols["qm"], ff.mul(cols["l"], cols["r"])))
    gate = ff.add(gate, ff.mul(cols["qo"], cols["o"]))
    gate = ff.add(gate, cols["qk"])
    bx = ff.mul(dc(s["beta"]), xd)
    idp = ff.add(ff.add(cols["l"], bx), gamma_d)
    idp = ff.mul(idp, ff.add(
        ff.add(cols["r"], ff.mul(dc(s["u"]), bx)), gamma_d))
    idp = ff.mul(idp, ff.add(
        ff.add(cols["o"], ff.mul(dc(s["u"] * s["u"] % q), bx)), gamma_d))
    beta_d = dc(s["beta"])
    sp = ff.add(ff.add(cols["l"], ff.mul(beta_d, cols["s1"])), gamma_d)
    sp = ff.mul(sp, ff.add(
        ff.add(cols["r"], ff.mul(beta_d, cols["s2"])), gamma_d))
    sp = ff.mul(sp, ff.add(
        ff.add(cols["o"], ff.mul(beta_d, cols["s3"])), gamma_d))
    ordering = ff.sub(ff.mul(sp, cols["zs"]), ff.mul(idp, cols["z"]))
    xm1_inv = ff.batch_inv(ff.sub(xd, one_d))
    l1 = ff.mul(ff.mul(zh_d, dc(s["Ninv"])), xm1_inv)
    local = ff.mul(l1, ff.sub(cols["z"], one_d))
    numd = ff.add(gate, ff.mul(dc(s["alpha"]), ordering))
    numd = ff.add(numd, ff.mul(dc(s["alpha2"]), local))
    return ff.mul(numd, zhi_d)


def _col_indexes(cs, N):
    """xa/xb/xc wire-index vectors for the L/R/O gather (row 0..N-1:
    nb_pub public rows then the gates; padding rows gather wire 0)."""
    cache = getattr(cs, "_plonk_col_idx", None)
    if cache is not None and cache[0].shape[0] == N:
        return cache
    nb_pub = cs.nb_public
    n = len(cs.sparse)
    xa = np.zeros(N, dtype=np.int64)
    xb = np.zeros(N, dtype=np.int64)
    xc = np.zeros(N, dtype=np.int64)
    xa[:nb_pub] = np.arange(nb_pub)
    xa[nb_pub:nb_pub + n] = np.fromiter(
        (c.xa for c in cs.sparse), dtype=np.int64, count=n)
    xb[nb_pub:nb_pub + n] = np.fromiter(
        (c.xb for c in cs.sparse), dtype=np.int64, count=n)
    xc[nb_pub:nb_pub + n] = np.fromiter(
        (c.xo for c in cs.sparse), dtype=np.int64, count=n)
    cs._plonk_col_idx = (xa, xb, xc)
    return cs._plonk_col_idx


def _pk_dev(pk, ffr):
    """Lazy per-pk device cache of the solver-independent columns."""
    dev = getattr(pk, "_dev", None)
    if dev is not None:
        return dev
    q = ffr.p.modulus
    N = pk.vk.size

    def enc(vals):
        return jnp.asarray(ffr.encode([v % q for v in vals]))

    dev = {
        "ql_c": enc(pk.ql_coeffs), "qr_c": enc(pk.qr_coeffs),
        "qm_c": enc(pk.qm_coeffs), "qo_c": enc(pk.qo_coeffs),
        "qk_c": enc(pk.qk_coeffs),
        "s1_c": enc(pk.s1_coeffs), "s2_c": enc(pk.s2_coeffs),
        "s3_c": enc(pk.s3_coeffs),
        "s1_v": enc(pk.s1_vals), "s2_v": enc(pk.s2_vals),
        "s3_v": enc(pk.s3_vals),
        "qk_lag": enc(pk.qk),
        "qcp_c": [enc(c) for c in pk.qcp_coeffs],
        "wpow": dev_powers(ffr, pk.vk.generator, N),
    }
    pk._dev = dev
    return dev
