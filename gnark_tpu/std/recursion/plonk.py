"""In-circuit PLONK verifier for BLS12-377 proofs inside BW6-761
circuits (reference std/recursion/plonk/verifier.go:673-997, on the
native 2-chain).

Requirements on the inner proof: it must be produced with
`plonk.prove(..., recursion_friendly=True)` — every Fiat-Shamir
challenge then comes from the MiMC transcript over the OUTER field
(backend/transcript.MimcTranscript), which this verifier can recompute
natively; challenges are truncated to r.bit_length()-8 bits so they
embed in the inner scalar field.

Field split: commitment coordinates are native (inner fp == outer fr);
the polynomial-identity algebra runs in the EMULATED inner scalar
field (std/math/emulated sum-of-products); scalars feed the curve
MSMs as bit decompositions of their limbs ([v]P == [v mod r]P, so the
non-canonical emulated representative is harmless).

This mirrors backend/plonk.verify step for step — every challenge,
fold and pairing equation matches the host verifier byte-for-byte in
recursion mode (asserted by tests/test_recursion_plonk.py)."""

from __future__ import annotations

from gnark_tpu.ec import host
from gnark_tpu.std.algebra.pairing_bls12377 import PairingCircuit
from gnark_tpu.std.algebra.sw_bls12377 import G1Circuit
from gnark_tpu.std.fiatshamir import Transcript as CTranscript
from gnark_tpu.std.hash.mimc import MiMCGadget
from gnark_tpu.std.math import emulated as emu


def proof_witness_plonk(proof):
    """Flatten a recursion-friendly bls12_377 PlonkProof into the flat
    assignment lists used by assert_proof_plonk."""
    pts = list(proof.lro) + [proof.z] + list(proof.h) \
        + list(proof.bsb22) + [proof.batched_h, proof.z_shift_h]
    flat_pts = []
    for (x, y) in pts:
        flat_pts += [x, y]
    return dict(pts=flat_pts, claimed=list(proof.claimed), zu=proof.zu)


class _Ctx:
    """Shared helpers bound to one api."""

    def __init__(self, api, vk):
        self.api = api
        self.vk = vk
        self.curve = vk.curve
        self.r = self.curve.fr.modulus
        self.rbits = self.r.bit_length()          # 253
        self.mask_bits = self.rbits - 8           # challenge width
        self.p_out = api.field()
        self.fr = emu.EmulatedField(api, emu.BLS12_377_FR_EMU)
        self.g1 = G1Circuit(api)
        self.pc = PairingCircuit(api)

    # -- canonical bit plumbing ----------------------------------------------

    def _assert_bits_leq(self, bits, bound: int):
        """AND-chain canonical comparison bits <= bound (LSB-first)."""
        api = self.api
        acc = 1
        for i in range(len(bits) - 1, -1, -1):
            if (bound >> i) & 1:
                acc = api.mul(acc, bits[i])
            else:
                api.assert_is_equal(api.mul(acc, bits[i]), 0)

    def bits_to_emu(self, bits) -> emu.Element:
        """LSB-first bits -> emulated fr element (limbs from bit
        slices; no range check needed — bits are boolean)."""
        api = self.api
        limbs = []
        for j in range(emu.K):
            chunk = bits[j * emu.B:(j + 1) * emu.B]
            limbs.append(api.from_binary(chunk) if chunk else 0)
        return emu.Element(limbs)

    def nat_to_emu_mod_r(self, v, canonical_lt_r: bool):
        """Native var (known < 2^rbits... enforced) -> emulated fr."""
        api = self.api
        bits = api.to_binary(v, self.rbits)
        if canonical_lt_r:
            self._assert_bits_leq(bits, self.r - 1)
        return bits, self.bits_to_emu(bits)

    def truncate_challenge(self, c):
        """Full-field MiMC output -> (native truncated challenge,
        bits, emulated fr element). Canonical decomposition of c is
        enforced so the prover cannot pick the aliased bits."""
        api = self.api
        pbits = self.p_out.bit_length()
        bits = api.to_binary(c, pbits)
        self._assert_bits_leq(bits, self.p_out - 1)
        tbits = bits[:self.mask_bits]
        tnat = api.from_binary(tbits)
        return tnat, tbits, self.bits_to_emu(tbits)

    def emu_to_bits(self, e: emu.Element):
        """Emulated element -> LSB-first bits of its (possibly
        non-canonical) integer value; fine for scalar mul."""
        api = self.api
        bits = []
        for l in e.limbs:
            if isinstance(l, int):
                bits += [(l >> i) & 1 for i in range(emu.B)]
            else:
                bits += api.to_binary(l, emu.B)
        return bits          # full width: the representative may be
                             # non-canonical, [v]P == [v mod r]P anyway

    def const_emu(self, v: int) -> emu.Element:
        return self.fr.from_const(v % self.r)


def assert_proof_plonk(api, vk, pv, publics):
    """Assert a recursion-friendly bls12_377 PLONK proof verifies
    against the CONSTANT inner vk.

    pv: dict from proof assignment with
        pts: flat [x0,y0,x1,y1,...] for
             [l, r, o, z, h0, h1, h2, *bsb22, batched_h, z_shift_h]
        claimed: native vars [lin_z, lz, rz, oz, s1z, s2z, qcp...]
        zu: native var
    publics: inner public values as native vars (no ONE wire)."""
    assert vk.curve.name == "bls12_377", "2-chain inner must be bls12_377"
    if len(publics) != vk.nb_public - 1:
        raise ValueError(f"want {vk.nb_public - 1} inner publics")
    nqcp = len(vk.qcp_c)

    cx = _Ctx(api, vk)
    fr, g1 = cx.fr, cx.g1
    q = cx.r
    N = vk.size
    w = vk.generator
    u = vk.coset_shift

    # -- unpack + wellformedness ---------------------------------------------
    raw = pv["pts"]
    npts = 9 + nqcp
    pts = [(raw[2 * i], raw[2 * i + 1]) for i in range(npts)]
    c_l, c_r, c_o, c_z, h0, h1, h2 = pts[:7]
    bsb22 = pts[7:7 + nqcp]
    batched_h, z_shift_h = pts[7 + nqcp], pts[8 + nqcp]
    for P in pts:
        g1.assert_on_curve(P)

    claimed_nat = list(pv["claimed"])
    assert len(claimed_nat) == 6 + nqcp
    zu_nat = pv["zu"]
    claimed = []
    for v in claimed_nat:
        _, e = cx.nat_to_emu_mod_r(v, canonical_lt_r=True)
        claimed.append(e)
    zu_bits, zu = cx.nat_to_emu_mod_r(zu_nat, canonical_lt_r=True)

    pub_emu = []
    for v in publics:
        _, e = cx.nat_to_emu_mod_r(v, canonical_lt_r=True)
        pub_emu.append(e)

    # -- Fiat-Shamir (mirrors MimcTranscript + _bind_public_data) ------------
    def mk_ts(names):
        ts = CTranscript(api, names,
                         hash_factory=lambda: MiMCGadget(
                             api, "bw6_761_fr"))
        return ts

    ts = mk_ts(["gamma", "beta", "alpha", "zeta"])

    def bind_const_pt(name, P):
        ts.bind(name, P[0], P[1])

    for P in vk.s_comm:
        bind_const_pt("gamma", P)
    for P in (vk.ql_c, vk.qr_c, vk.qm_c, vk.qo_c, vk.qk_c):
        bind_const_pt("gamma", P)
    for P in vk.qcp_c:
        bind_const_pt("gamma", P)
    ts.bind("gamma", 1)                  # the constant-one wire
    for v in publics:
        ts.bind("gamma", v)
    for P in (c_l, c_r, c_o):
        ts.bind("gamma", P[0], P[1])

    def challenge(name):
        c_full = ts.compute_challenge(name)
        tnat, tbits, temu = cx.truncate_challenge(c_full)
        ts._value[name] = tnat           # next prev = truncated (host)
        return tnat, tbits, temu

    _, _, gamma = challenge("gamma")
    _, _, beta = challenge("beta")
    for P in bsb22:
        ts.bind("alpha", P[0], P[1])
    ts.bind("alpha", c_z[0], c_z[1])
    _, _, alpha = challenge("alpha")
    for P in (h0, h1, h2):
        ts.bind("zeta", P[0], P[1])
    zeta_nat, zeta_bits, zeta = challenge("zeta")

    # -- scalar identities (emulated fr) -------------------------------------
    zeta_n = zeta
    for _ in range(N.bit_length() - 1):
        zeta_n = fr.sqr(zeta_n)
    one = cx.const_emu(1)
    zh = fr.sub(zeta_n, one)
    n_inv = pow(N, -1, q)
    l1 = fr.div(zh, fr.sub(zeta, one))
    l1 = fr.sum_of_products([(1, l1, cx.const_emu(n_inv))])

    # PI = sum_i w_i * L_i(zeta), over [1] + publics
    pi = cx.const_emu(0)
    accw = 1
    for v in [one] + pub_emu:
        li = fr.div(zh, fr.sub(zeta, cx.const_emu(accw)))
        li = fr.sum_of_products(
            [(1, li, cx.const_emu(n_inv * accw % q))])
        pi = fr.sum_of_products([(1, li, v)], lins=[(1, pi)])
        accw = accw * w % q

    # BSB22 contributions (mirrors _h2f_bsb22 mimc mode)
    for i, cci in enumerate(vk.commitment_rows):
        h = MiMCGadget(api, "bw6_761_fr")
        h.write(int.from_bytes(b"BSB22-Plonk", "big"))
        h.write(bsb22[i][0], bsb22[i][1])
        _, _, hashed = cx.truncate_challenge(h.sum())
        wi = pow(w, vk.nb_public + cci, q)
        li = fr.div(zh, fr.sub(zeta, cx.const_emu(wi)))
        li = fr.sum_of_products([(1, li, cx.const_emu(n_inv * wi % q))])
        pi = fr.sum_of_products([(1, li, hashed)], lins=[(1, pi)])

    lin_z, lz, rz, oz, s1z, s2z = claimed[:6]
    qcpz = claimed[6:]
    alpha2 = fr.sqr(alpha)
    a2l1 = fr.mul(alpha2, l1)

    # constLin check (backend verify: -(pi - a2l1 + t))
    t1 = fr.sum_of_products([(1, beta, s1z)], lins=[(1, lz), (1, gamma)])
    t2 = fr.sum_of_products([(1, beta, s2z)], lins=[(1, rz), (1, gamma)])
    t = fr.mul(t1, t2)
    t = fr.sum_of_products([(1, t, fr.sum_of_products(
        lins=[(1, oz), (1, gamma)]))])
    t = fr.mul(fr.mul(t, alpha), zu)
    const_lin = fr.sum_of_products(
        lins=[(-1, pi), (1, a2l1), (-1, t)])
    fr.assert_is_equal(lin_z, const_lin)

    # -- linearized digest (mirrors _lin_digest_prover) ----------------------
    _s1 = fr.mul(fr.mul(fr.mul(alpha, beta), fr.mul(t1, t2)), zu)
    # recompute t1,t2 fresh is fine (same values)
    bz = fr.mul(beta, zeta)
    idp = fr.sum_of_products(lins=[(1, lz), (1, bz), (1, gamma)])
    ubz = fr.mul(bz, cx.const_emu(u))
    idp = fr.mul(idp, fr.sum_of_products(
        lins=[(1, rz), (1, ubz), (1, gamma)]))
    u2bz = fr.mul(bz, cx.const_emu(u * u % q))
    idp = fr.mul(idp, fr.sum_of_products(
        lins=[(1, oz), (1, u2bz), (1, gamma)]))
    coeff_z = fr.sum_of_products([(-1, alpha, idp)], lins=[(1, a2l1)])

    zp2 = zeta_n
    zp2 = fr.mul(zp2, fr.sqr(zeta))               # zeta^(N+2)
    rl = fr.mul(lz, rz)
    zh_neg = fr.neg(zh)
    zh_zp2 = fr.mul(zh_neg, zp2)
    zh_zp4 = fr.mul(zh_zp2, zp2)

    lin_pts = list(bsb22) + [vk.ql_c, vk.qr_c, vk.qm_c, vk.qo_c,
                             vk.qk_c, vk.s_comm[2], c_z, h0, h1, h2]
    lin_scs = qcpz + [lz, rz, rl, oz, one, _s1, coeff_z,
                      zh_neg, zh_zp2, zh_zp4]
    lin_digest = g1.msm_bits(
        [(P, cx.emu_to_bits(s)) for P, s in zip(lin_pts, lin_scs)])

    # -- batched opening fold (mirrors _fold_challenge mimc mode) ------------
    digests = [lin_digest, c_l, c_r, c_o, vk.s_comm[0], vk.s_comm[1]] \
        + list(vk.qcp_c)
    fh = MiMCGadget(api, "bw6_761_fr")
    fh.write(int.from_bytes(b"fold", "big"))
    for d in digests:
        fh.write(d[0], d[1])
    fh.write(zeta_nat)
    fh.write(zu_nat)
    for v in claimed_nat:
        fh.write(v)
    _, _, fold_ch = cx.truncate_challenge(fh.sum())

    # folded commitment and value: sum ch^i * (D_i, v_i)
    chp = one
    fold_terms = []
    folded_v = cx.const_emu(0)
    for i, (d, v) in enumerate(zip(digests, claimed)):
        if i == 0:
            fold_terms.append((d, None))     # ch^0 = 1
            folded_v = fr.sum_of_products(lins=[(1, folded_v), (1, v)])
        else:
            chp = fr.mul(chp, fold_ch)
            fold_terms.append((d, chp))
            folded_v = fr.sum_of_products([(1, chp, v)],
                                          lins=[(1, folded_v)])
    folded_c = g1.msm_bits(
        [(d, cx.emu_to_bits(s)) for d, s in fold_terms if s is not None])
    folded_c = g1.add_distinct(folded_c, fold_terms[0][0])

    # -- the two KZG openings, folded into ONE pairing product ---------------
    # opening 1: folded_c opens to folded_v at zeta with batched_h
    # opening 2: c_z opens to zu at w*zeta with z_shift_h
    # fold with rho: e(F1 + rho*F2, G2) * e(-(W1 + rho*W2), tau G2) == 1
    # where Fi = Ci - vi*G1 + zi*Wi
    rh = MiMCGadget(api, "bw6_761_fr")
    rh.write(int.from_bytes(b"rho", "big"))
    for P in (folded_c, batched_h, c_z, z_shift_h):
        rh.write(P[0], P[1])
    rh.write(zeta_nat, zu_nat)
    _, rho_bits, rho = cx.truncate_challenge(rh.sum())

    g1_gen = tuple(vk.curve.g1)
    wz = fr.mul(zeta, cx.const_emu(w))

    # F1 = folded_c - folded_v*G + zeta*W1
    f1_terms = [(g1_gen, cx.emu_to_bits(fr.neg(folded_v))),
                (batched_h, cx.emu_to_bits(zeta))]
    # rho * (c_z - zu*G + wz*W2) = rho*c_z - (rho*zu)*G + (rho*wz)*W2
    rz2 = fr.mul(rho, zu)
    rwz = fr.mul(rho, wz)
    f2_terms = [(c_z, rho_bits),
                (g1_gen, cx.emu_to_bits(fr.neg(rz2))),
                (z_shift_h, cx.emu_to_bits(rwz))]
    F = g1.msm_bits(f1_terms + f2_terms)
    F = g1.add_distinct(F, folded_c)

    W = g1.msm_bits([(z_shift_h, rho_bits)])
    W = g1.add_distinct(W, batched_h)
    negW = g1.neg(W)

    cx.pc.assert_pairing_product_is_one(
        [(F, tuple(vk.g2_gen)), (negW, tuple(vk.g2_tau))])


# -- emulated variant: BN254 PLONK proofs inside a BN254-scalar circuit ------

def proof_witness_plonk_bn254(proof):
    """Flatten a recursion-friendly bn254 PlonkProof into assignments
    for assert_proof_plonk_bn254: point coordinates become emulated-fp
    limbs (LSB-first, std/math/emulated layout), scalars stay native."""
    pts = list(proof.lro) + [proof.z] + list(proof.h) \
        + list(proof.bsb22) + [proof.batched_h, proof.z_shift_h]
    limbs = []
    for (x, y) in pts:
        for v in (x, y):
            limbs += [(v >> (emu.B * i)) & emu.MASK for i in range(emu.K)]
    return dict(pt_limbs=limbs, claimed=list(proof.claimed),
                zu=proof.zu)


def assert_proof_plonk_bn254(api, vk, pv, publics):
    """Assert a recursion-friendly bn254 PLONK proof verifies against
    the CONSTANT inner vk — the EMULATED recursion path (reference
    std/recursion/plonk/verifier.go with sw_bn254; self-recursion:
    inner fr == the outer circuit field, so ALL polynomial-identity
    algebra is native and only the curve/pairing ops are emulated).

    pv: dict with
        pt_limbs: flat emulated-fp limb vars, emu.K per coordinate,
             (x, y) per point, points ordered
             [l, r, o, z, h0, h1, h2, *bsb22, batched_h, z_shift_h]
        claimed: native vars [lin_z, lz, rz, oz, s1z, s2z, qcp...]
        zu: native var
    publics: inner public values as native vars (no ONE wire).

    Transcript convention mirrors the host recursion mode exactly:
    MiMC over bn254_fr, point coordinates bound as their emu.B-bit
    limbs (backend/transcript.MimcTranscript.coord_fes)."""
    from gnark_tpu.std.algebra.pairing_bn254 import FixedG2, PairingBN254
    from gnark_tpu.std.algebra.sw_bn254 import G1EmulatedBN254

    assert vk.curve.name == "bn254", "emulated path expects bn254 inner"
    if len(publics) != vk.nb_public - 1:
        raise ValueError(f"want {vk.nb_public - 1} inner publics")
    nqcp = len(vk.qcp_c)

    pr = PairingBN254(api)
    fe = pr.fe
    g1 = G1EmulatedBN254(api, fe)
    q = vk.curve.fr.modulus
    assert api.field() == q, "outer field must be the inner fr"
    rbits = q.bit_length()
    mask_bits = rbits - 8
    N = vk.size
    w = vk.generator
    u = vk.coset_shift
    nbits = vk.curve.fr.bits

    # -- unpack + wellformedness ---------------------------------------------
    npts = 9 + nqcp
    k = emu.K
    raw = pv["pt_limbs"]
    assert len(raw) == 2 * k * npts
    pts = []
    for i in range(npts):
        x = fe.from_limb_vars(raw[2 * k * i: 2 * k * i + k])
        y = fe.from_limb_vars(raw[2 * k * i + k: 2 * k * (i + 1)])
        pts.append((x, y))
    c_l, c_r, c_o, c_z, h0, h1, h2 = pts[:7]
    bsb22 = pts[7:7 + nqcp]
    batched_h, z_shift_h = pts[7 + nqcp], pts[8 + nqcp]
    for P in pts:
        pr.assert_on_g1(P)

    claimed = list(pv["claimed"])
    assert len(claimed) == 6 + nqcp
    zu = pv["zu"]

    # -- Fiat-Shamir (mirrors MimcTranscript, coords bound as limbs) ---------
    from gnark_tpu.std.fiatshamir import Transcript as CTranscript
    ts = CTranscript(api, ["gamma", "beta", "alpha", "zeta"],
                     hash_factory=lambda: MiMCGadget(api, "bn254_fr"))

    def const_coord_limbs(c: int):
        return [(c >> (emu.B * i)) & emu.MASK for i in range(emu.K)]

    def bind_const_pt(name, P):
        ts.bind(name, *const_coord_limbs(P[0]), *const_coord_limbs(P[1]))

    def bind_var_pt(name, P):
        ts.bind(name, *P[0].limbs, *P[1].limbs)

    for P in vk.s_comm:
        bind_const_pt("gamma", P)
    for P in (vk.ql_c, vk.qr_c, vk.qm_c, vk.qo_c, vk.qk_c):
        bind_const_pt("gamma", P)
    for P in vk.qcp_c:
        bind_const_pt("gamma", P)
    ts.bind("gamma", 1)                  # the constant-one wire
    for v in publics:
        ts.bind("gamma", v)
    for P in (c_l, c_r, c_o):
        bind_var_pt("gamma", P)

    def _assert_bits_leq(bits, bound: int):
        acc = 1
        for i in range(len(bits) - 1, -1, -1):
            if (bound >> i) & 1:
                acc = api.mul(acc, bits[i])
            else:
                api.assert_is_equal(api.mul(acc, bits[i]), 0)

    def truncate(c):
        """Canonical-decomposition truncation to rbits-8 bits."""
        bits = api.to_binary(c, rbits)
        _assert_bits_leq(bits, q - 1)
        return api.from_binary(bits[:mask_bits])

    def challenge(name):
        c_full = ts.compute_challenge(name)
        t = truncate(c_full)
        ts._value[name] = t              # next prev = truncated
        return t

    gamma = challenge("gamma")
    beta = challenge("beta")
    for P in bsb22:
        bind_var_pt("alpha", P)
    bind_var_pt("alpha", c_z)
    alpha = challenge("alpha")
    for P in (h0, h1, h2):
        bind_var_pt("zeta", P)
    zeta = challenge("zeta")

    # -- scalar identities (NATIVE field = inner fr) --------------------------
    zeta_n = zeta
    for _ in range(N.bit_length() - 1):
        zeta_n = api.mul(zeta_n, zeta_n)
    zh = api.sub(zeta_n, 1)
    n_inv = pow(N, -1, q)
    l1 = api.mul(api.div(zh, api.sub(zeta, 1)), n_inv)

    # PI = sum_i w_i * L_i(zeta), over [1] + publics
    pi = 0
    accw = 1
    for v in [1] + list(publics):
        li = api.mul(api.div(zh, api.sub(zeta, accw)),
                     n_inv * accw % q)
        pi = api.add(pi, api.mul(li, v))
        accw = accw * w % q

    # BSB22 contributions (mirrors _h2f_bsb22 mimc mode, limb coords)
    for i, cci in enumerate(vk.commitment_rows):
        h = MiMCGadget(api, "bn254_fr")
        h.write(int.from_bytes(b"BSB22-Plonk", "big"))
        h.write(*bsb22[i][0].limbs, *bsb22[i][1].limbs)
        hashed = truncate(h.sum())
        wi = pow(w, vk.nb_public + cci, q)
        li = api.mul(api.div(zh, api.sub(zeta, wi)), n_inv * wi % q)
        pi = api.add(pi, api.mul(li, hashed))

    lin_z, lz, rz, oz, s1z, s2z = claimed[:6]
    qcpz = claimed[6:]
    alpha2 = api.mul(alpha, alpha)
    a2l1 = api.mul(alpha2, l1)

    # constLin check (backend verify: -(pi - a2l1 + t))
    t1 = api.add(lz, api.mul(beta, s1z), gamma)
    t2 = api.add(rz, api.mul(beta, s2z), gamma)
    t = api.mul(api.mul(t1, t2), api.add(oz, gamma))
    t = api.mul(api.mul(t, alpha), zu)
    const_lin = api.sub(api.sub(a2l1, pi), t)
    api.assert_is_equal(lin_z, const_lin)

    # -- linearized digest (mirrors _lin_digest_prover) ----------------------
    _s1 = api.mul(api.mul(api.mul(alpha, beta), api.mul(t1, t2)), zu)
    bz = api.mul(beta, zeta)
    idp = api.add(lz, bz, gamma)
    idp = api.mul(idp, api.add(rz, api.mul(bz, u), gamma))
    idp = api.mul(idp, api.add(oz, api.mul(bz, u * u % q), gamma))
    coeff_z = api.sub(a2l1, api.mul(alpha, idp))

    zp2 = api.mul(zeta_n, api.mul(zeta, zeta))      # zeta^(N+2)
    rl = api.mul(lz, rz)
    zh_neg = api.neg(zh)
    zh_zp2 = api.mul(zh_neg, zp2)
    zh_zp4 = api.mul(zh_zp2, zp2)

    def msm_mixed(terms):
        """sum s_i * P_i: P constant tuple or variable emulated point;
        native scalars. Folds with add_distinct."""
        const_ps, const_ss, acc = [], [], None
        for P, s in terms:
            if isinstance(P, tuple) and isinstance(P[0], int):
                const_ps.append(P)
                const_ss.append(s)
            else:
                r = g1.scalar_mul_var_base(P, s, nbits)
                acc = r if acc is None else g1.add_distinct(acc, r)
        if const_ps:
            r = g1.msm_const_bases(const_ps, const_ss, nbits)
            acc = r if acc is None else g1.add_distinct(acc, r)
        return acc

    lin_pts = list(bsb22) + [vk.ql_c, vk.qr_c, vk.qm_c, vk.qo_c,
                             vk.qk_c, vk.s_comm[2], c_z, h0, h1, h2]
    lin_scs = qcpz + [lz, rz, rl, oz, 1, _s1, coeff_z,
                      zh_neg, zh_zp2, zh_zp4]
    lin_digest = msm_mixed(list(zip(lin_pts, lin_scs)))

    # -- batched opening fold (mirrors _fold_challenge mimc mode) ------------
    digests = [lin_digest, c_l, c_r, c_o,
               g1.from_const(vk.s_comm[0]), g1.from_const(vk.s_comm[1])] \
        + [g1.from_const(P) for P in vk.qcp_c]
    fh = MiMCGadget(api, "bn254_fr")
    fh.write(int.from_bytes(b"fold", "big"))
    for d in digests:
        fh.write(*d[0].limbs, *d[1].limbs)
    fh.write(zeta)
    fh.write(zu)
    for v in claimed:
        fh.write(v)
    fold_ch = truncate(fh.sum())

    # folded commitment and value: sum ch^i * (D_i, v_i)
    chp = 1
    fold_terms = []
    folded_v = 0
    for i, (d, v) in enumerate(zip(digests, claimed)):
        if i == 0:
            folded_v = api.add(folded_v, v)
        else:
            chp = api.mul(chp, fold_ch)
            fold_terms.append((d, chp))
            folded_v = api.add(folded_v, api.mul(chp, v))
    folded_c = msm_mixed(fold_terms)
    folded_c = g1.add_distinct(folded_c, digests[0])

    # -- the two KZG openings, folded into ONE pairing product ---------------
    # opening 1: folded_c opens to folded_v at zeta with batched_h
    # opening 2: c_z opens to zu at w*zeta with z_shift_h
    # fold with rho: e(F1 + rho*F2, G2) * e(-(W1 + rho*W2), tau G2) == 1
    # where Fi = Ci - vi*G1 + zi*Wi
    rh = MiMCGadget(api, "bn254_fr")
    rh.write(int.from_bytes(b"rho", "big"))
    for P in (folded_c, batched_h, c_z, z_shift_h):
        rh.write(*P[0].limbs, *P[1].limbs)
    rh.write(zeta, zu)
    rho = truncate(rh.sum())

    g1_gen = tuple(vk.curve.g1)
    wz = api.mul(zeta, w)

    # F = folded_c - folded_v*G + zeta*W1
    #     + rho*c_z - (rho*zu)*G + (rho*w*zeta)*W2
    F = msm_mixed([
        (g1_gen, api.neg(api.add(folded_v, api.mul(rho, zu)))),
        (batched_h, zeta),
        (c_z, rho),
        (z_shift_h, api.mul(rho, wz)),
    ])
    F = g1.add_distinct(F, folded_c)

    W = g1.scalar_mul_var_base(z_shift_h, rho, nbits)
    W = g1.add_distinct(W, batched_h)
    negW = g1.neg(W)

    pr.pairing_check([(F, FixedG2(tuple(vk.g2_gen))),
                      (negW, FixedG2(tuple(vk.g2_tau)))])
