"""EVM precompile gadgets vs the host BN254 oracle."""

import random

from gnark_tpu import fields
from gnark_tpu.ec import curves, host
from gnark_tpu.frontend import Circuit, Public, Secret, compile_circuit, witness
from gnark_tpu.std import evmprecompiles as evm
from gnark_tpu.std.math import emulated as emu
from gnark_tpu.test_engine import is_solved

F = fields.BN254_FR
RNG = random.Random(2718)
BN = curves.CURVES["bn254"]


def limbs(v):
    return [(v >> (emu.B * i)) & emu.MASK for i in range(emu.K)]


class EcAdd(Circuit):
    ax: list[Secret]
    ay: list[Secret]
    bx: list[Secret]
    by: list[Secret]
    rx: list[Public]

    def __init__(self, **kw):
        for n in ("ax", "ay", "bx", "by", "rx"):
            setattr(self, n, [None] * emu.K)
        super().__init__(**kw)

    def define(self, api):
        f = emu.EmulatedField(api, emu.BN254_FP_EMU)
        p1 = (f.from_limb_vars(self.ax), f.from_limb_vars(self.ay))
        p2 = (f.from_limb_vars(self.bx), f.from_limb_vars(self.by))
        r = evm.ecadd(api, p1, p2)
        f.assert_is_equal(r[0], f.from_limb_vars(self.rx))


def test_ecadd_precompile():
    fh = BN.host_fp
    P = host.ec_mul(fh, BN.g1, RNG.randrange(1, 10 ** 30))
    Q = host.ec_mul(fh, BN.g1, RNG.randrange(1, 10 ** 30))
    R = host.ec_add(fh, P, Q)
    c = EcAdd()
    c.ax, c.ay = limbs(P[0]), limbs(P[1])
    c.bx, c.by = limbs(Q[0]), limbs(Q[1])
    c.rx = limbs(R[0])
    assert is_solved(c, F)
    bad = EcAdd()
    bad.ax, bad.ay, bad.bx, bad.by = c.ax, c.ay, c.bx, c.by
    bad.rx = limbs((R[0] + 1) % BN.fp.modulus)
    assert not is_solved(bad, F)
    # off-curve input rejected
    off = EcAdd()
    off.ax, off.ay = limbs(P[0]), limbs((P[1] + 1) % BN.fp.modulus)
    off.bx, off.by, off.rx = c.bx, c.by, c.rx
    assert not is_solved(off, F)


class EcMul(Circuit):
    px: list[Secret]
    py: list[Secret]
    k: Secret
    rx: list[Public]

    def __init__(self, **kw):
        for n in ("px", "py", "rx"):
            setattr(self, n, [None] * emu.K)
        super().__init__(**kw)

    def define(self, api):
        f = emu.EmulatedField(api, emu.BN254_FP_EMU)
        p = (f.from_limb_vars(self.px), f.from_limb_vars(self.py))
        bits = api.to_binary(self.k, 16)
        r = evm.ecmul(api, p, bits)
        f.assert_is_equal(r[0], f.from_limb_vars(self.rx))


def test_ecmul_precompile():
    fh = BN.host_fp
    P = host.ec_mul(fh, BN.g1, RNG.randrange(1, 10 ** 30))
    k = RNG.randrange(1, 1 << 16)
    R = host.ec_mul(fh, P, k)
    c = EcMul(k=k)
    c.px, c.py = limbs(P[0]), limbs(P[1])
    c.rx = limbs(R[0])
    assert is_solved(c, F)
    bad = EcMul(k=k + 1)
    bad.px, bad.py, bad.rx = c.px, c.py, c.rx
    assert not is_solved(bad, F)


# -- 0x05 MODEXP -------------------------------------------------------------

class ModExp(Circuit):
    base: list[Secret]
    mod: list[Secret]
    e: Secret
    r0: Public

    def __init__(self, **kw):
        self.base = [None] * emu.K
        self.mod = [None] * emu.K
        super().__init__(**kw)

    def define(self, api):
        for l in self.base + self.mod:
            api.to_binary(l, emu.B)
        ebits = api.to_binary(self.e, 16)       # MSB-first expected
        r = evm.modexp(api, self.base, list(reversed(ebits)), self.mod)
        api.assert_is_equal(r.limbs[0], self.r0)


def test_modexp_precompile():
    for m in (2 ** 255 - 19, 97, 1):
        b = RNG.randrange(1, 1 << 200)
        e = RNG.randrange(0, 1 << 16)
        want = pow(b, e, m)
        c = ModExp(e=e, r0=want & emu.MASK)
        c.base, c.mod = limbs(b), limbs(m)
        assert is_solved(c, F), f"m={m}"
        bad = ModExp(e=e, r0=(want + 1) & emu.MASK)
        bad.base, bad.mod = limbs(b), limbs(m)
        assert not is_solved(bad, F)


# -- 0x01 ECRECOVER ----------------------------------------------------------

class EcRecover(Circuit):
    h: list[Public]
    r: list[Secret]
    s: list[Secret]
    v: Secret
    qx0: Public

    def __init__(self, **kw):
        for n in ("h", "r", "s"):
            setattr(self, n, [None] * emu.K)
        super().__init__(**kw)

    def define(self, api):
        pub = evm.ecrecover(api, self.h, self.v, self.r, self.s)
        api.assert_is_equal(pub[0].limbs[0], self.qx0)


import pytest


@pytest.mark.slow
def test_ecrecover_precompile():
    import tests.test_ecdsa as te
    d = RNG.randrange(1, te._n)
    Q = te._mul(te._G, d)
    h = RNG.randrange(1, te._n)
    r, s = te._sign(d, h)
    # recompute v (parity of R.y) by re-deriving R from the equation
    rinv = pow(r, -1, te._n)
    u1, u2 = (-h * rinv) % te._n, (s * rinv) % te._n
    # R candidates: x = r with both parities; find which recovers Q
    for v in (0, 1):
        hint = evm._ecrecover_pub(
            None,
            [emu.K] + limbs(te._p) + limbs(te._n) + limbs(0) + limbs(7)
            + limbs(te._G[0]) + limbs(te._G[1]) + limbs(h) + limbs(r)
            + limbs(s) + [v])
        x_rec = sum(l << (emu.B * i) for i, l in enumerate(hint[:emu.K]))
        if x_rec == Q[0]:
            break
    else:
        pytest.fail("no recovery id matched")
    c = EcRecover(v=v, qx0=Q[0] & emu.MASK)
    c.h, c.r, c.s = limbs(h), limbs(r), limbs(s)
    assert is_solved(c, F)
    badv = EcRecover(v=1 - v, qx0=Q[0] & emu.MASK)
    badv.h, badv.r, badv.s = limbs(h), limbs(r), limbs(s)
    assert not is_solved(badv, F)


# -- 0x08 ECPAIR -------------------------------------------------------------

class EcPair(Circuit):
    ins: list[Secret]

    def __init__(self, **kw):
        self.ins = [None] * (2 * 6 * emu.K)
        super().__init__(**kw)

    def define(self, api):
        from gnark_tpu.std.algebra.pairing_bn254 import G2Point
        f = emu.EmulatedField(api, emu.BN254_FP_EMU)
        vals = self.ins
        pairs = []
        off = 0
        for _ in range(2):
            els = [f.from_limb_vars(vals[off + emu.K * i:
                                         off + emu.K * (i + 1)])
                   for i in range(6)]
            off += 6 * emu.K
            pairs.append(((els[0], els[1]),
                          G2Point((els[2], els[3]), (els[4], els[5]))))
        evm.ecpair(api, pairs)


@pytest.mark.slow
def test_ecpair_precompile():
    fh = BN.host_fp
    f2 = BN.host_g2_field
    a = RNG.randrange(2, 1 << 30)
    aP = host.ec_mul(fh, BN.g1, a)
    nP = host.ec_neg(fh, BN.g1)
    aQ = host.ec_mul(f2, BN.g2, a)

    def flat(P, Q):
        (x, y) = P
        (qx, qy) = Q
        return (limbs(x) + limbs(y) + limbs(qx[0]) + limbs(qx[1])
                + limbs(qy[0]) + limbs(qy[1]))

    good = EcPair()
    good.ins = flat(aP, BN.g2) + flat(nP, aQ)
    assert is_solved(good, F)
    bad = EcPair()
    bad.ins = flat(aP, BN.g2) + flat(BN.g1, aQ)
    assert not is_solved(bad, F)


# -- 0x100 P256VERIFY --------------------------------------------------------

@pytest.mark.slow
def test_p256_verify_precompile():
    from gnark_tpu.std.algebra.sw_emulated import P256
    p, n = P256.fp.modulus, P256.fr.modulus
    a, G = P256.a, (P256.gx, P256.gy)

    def add(A, Bp):
        if A is None:
            return Bp
        if Bp is None:
            return A
        if A[0] == Bp[0]:
            if (A[1] + Bp[1]) % p == 0:
                return None
            lam = (3 * A[0] * A[0] + a) * pow(2 * A[1], -1, p) % p
        else:
            lam = (Bp[1] - A[1]) * pow(Bp[0] - A[0], -1, p) % p
        x = (lam * lam - A[0] - Bp[0]) % p
        return (x, (lam * (A[0] - x) - A[1]) % p)

    def mul(P_, k):
        R = None
        while k:
            if k & 1:
                R = add(R, P_)
            P_ = add(P_, P_)
            k >>= 1
        return R

    d = RNG.randrange(1, n)
    Q = mul(G, d)
    h = RNG.randrange(1, n)
    while True:
        k = RNG.randrange(1, n)
        r = mul(G, k)[0] % n
        if r == 0:
            continue
        s = (h + r * d) * pow(k, -1, n) % n
        if s:
            break

    class C(Circuit):
        qx: list[Public]
        qy: list[Public]
        h: list[Public]
        r: list[Secret]
        s: list[Secret]

        def __init__(self, **kw):
            for nm in ("qx", "qy", "h", "r", "s"):
                setattr(self, nm, [None] * emu.K)
            super().__init__(**kw)

        def define(self, api):
            f = emu.EmulatedField(api, P256.fp)
            pub = (f.from_limb_vars(self.qx), f.from_limb_vars(self.qy))
            evm.p256_verify(api, pub, self.h, self.r, self.s)

    c = C()
    c.qx, c.qy, c.h, c.r, c.s = (limbs(Q[0]), limbs(Q[1]), limbs(h),
                                 limbs(r), limbs(s))
    assert is_solved(c, F)
    bad = C()
    bad.qx, bad.qy, bad.h = c.qx, c.qy, limbs((h + 1) % n)
    bad.r, bad.s = c.r, c.s
    assert not is_solved(bad, F)


# -- BLS12-381 family ---------------------------------------------------------

BLS = curves.CURVES["bls12_381"]


def limbs381(v):
    k = emu.BLS12_381_FP_EMU.k
    return [(v >> (emu.B * i)) & emu.MASK for i in range(k)]


def limbs381_fr(v):
    k = emu.BLS12_381_FR_EMU.k
    return [(v >> (emu.B * i)) & emu.MASK for i in range(k)]


@pytest.mark.slow
def test_bls_g1add_precompile():
    fh = BLS.host_fp
    P = host.ec_mul(fh, BLS.g1, 5)
    Q = host.ec_mul(fh, BLS.g1, 9)
    R = host.ec_add(fh, P, Q)
    k = emu.BLS12_381_FP_EMU.k

    class C(Circuit):
        ins: list[Secret]
        rx: list[Public]

        def __init__(self, **kw):
            self.ins = [None] * (4 * k)
            self.rx = [None] * k
            super().__init__(**kw)

        def define(self, api):
            f = emu.EmulatedField(api, emu.BLS12_381_FP_EMU)
            els = [f.from_limb_vars(self.ins[k * i:k * (i + 1)])
                   for i in range(4)]
            r = evm.bls_g1add(api, (els[0], els[1]), (els[2], els[3]))
            f.assert_is_equal(r[0], f.from_limb_vars(self.rx))

    good = C()
    good.ins = limbs381(P[0]) + limbs381(P[1]) + limbs381(Q[0]) \
        + limbs381(Q[1])
    good.rx = limbs381(R[0])
    assert is_solved(good, F)
    bad = C()
    bad.ins = good.ins
    bad.rx = limbs381((R[0] + 1) % BLS.fp.modulus)
    assert not is_solved(bad, F)


@pytest.mark.slow
def test_kzg_point_eval_precompile():
    """EIP-4844 point evaluation over a real BLS12-381 KZG opening."""
    import random as _r
    from gnark_tpu.backend import kzg
    rng = _r.Random(4844)
    q = BLS.fr.modulus
    srs = kzg.setup_srs("bls12_381", 8, rng=rng)
    coeffs = [rng.randrange(q) for _ in range(6)]
    com = kzg.commit(srs, coeffs)
    z = rng.randrange(2, q)
    proof = kzg.open_at(srs, coeffs, z)
    assert kzg.verify_opening(srs, com, proof, z)
    k = emu.BLS12_381_FP_EMU.k
    kf = emu.BLS12_381_FR_EMU.k

    class C(Circuit):
        ins: list[Secret]
        zl: list[Public]
        yl: list[Public]

        def __init__(self, **kw):
            self.ins = [None] * (4 * k)
            self.zl = [None] * kf
            self.yl = [None] * kf
            super().__init__(**kw)

        def define(self, api):
            f = emu.EmulatedField(api, emu.BLS12_381_FP_EMU)
            els = [f.from_limb_vars(self.ins[k * i:k * (i + 1)])
                   for i in range(4)]
            evm.kzg_point_eval(api, (els[0], els[1]),
                               (els[2], els[3]),
                               self.zl, self.yl, srs.g2_tau)

    good = C()
    good.ins = (limbs381(com[0]) + limbs381(com[1])
                + limbs381(proof.h[0]) + limbs381(proof.h[1]))
    good.zl = limbs381_fr(z)
    good.yl = limbs381_fr(proof.claimed_value)
    assert is_solved(good, F)
    bad = C()
    bad.ins = good.ins
    bad.zl = good.zl
    bad.yl = limbs381_fr((proof.claimed_value + 1) % q)
    assert not is_solved(bad, F)


@pytest.mark.slow
def test_bls_g2msm_precompile():
    f2h = BLS.host_g2_field
    Q = BLS.g2
    k1, k2 = 5, 9
    R = host.ec_add(f2h, host.ec_mul(f2h, Q, k1),
                    host.ec_mul(f2h, host.ec_dbl(f2h, Q), k2))
    k = emu.BLS12_381_FP_EMU.k
    Q2h = host.ec_dbl(f2h, Q)

    class C(Circuit):
        rx0: list[Public]

        def __init__(self, **kw):
            self.rx0 = [None] * k
            super().__init__(**kw)

        def define(self, api):
            from gnark_tpu.std.algebra.pairing_bls12381 import G2Point381
            f = emu.EmulatedField(api, emu.BLS12_381_FP_EMU)

            def mkq(P):
                return G2Point381(
                    (f.from_const(P[0][0]), f.from_const(P[0][1])),
                    (f.from_const(P[1][0]), f.from_const(P[1][1])))

            bits1 = [(k1 >> i) & 1 for i in range(4)]
            bits2 = [(k2 >> i) & 1 for i in range(4)]
            out = evm.bls_g2msm(api, [mkq(Q), mkq(Q2h)], [bits1, bits2])
            f.assert_is_equal(out.x[0], f.from_limb_vars(self.rx0))

    good = C()
    good.rx0 = limbs381(R[0][0])
    assert is_solved(good, F)


def test_add_unified_edge_cases():
    """Complete addition: doubling, inverses, identity operands."""
    from gnark_tpu.std.algebra.sw_emulated import EmulatedCurve
    fh = BN.host_fp
    P = host.ec_mul(fh, BN.g1, 5)
    Q = host.ec_mul(fh, BN.g1, 9)
    cases = [
        (P, Q, host.ec_add(fh, P, Q)),
        (P, P, host.ec_dbl(fh, P)),
        (P, host.ec_neg(fh, P), host.INF),
        (host.INF, Q, Q),
        (P, host.INF, P),
        (host.INF, host.INF, host.INF),
    ]

    def coords(pt):
        return (0, 0) if pt is host.INF else pt

    class C(Circuit):
        ins: list[Secret]
        rx: list[Public]
        ry: list[Public]

        def __init__(self, **kw):
            self.ins = [None] * (4 * emu.K)
            self.rx = [None] * emu.K
            self.ry = [None] * emu.K
            super().__init__(**kw)

        def define(self, api):
            curve = EmulatedCurve(api, evm.BN254_G1)
            f = curve.f
            els = [f.from_limb_vars(self.ins[emu.K * i:emu.K * (i + 1)])
                   for i in range(4)]
            r = curve.add_unified((els[0], els[1]), (els[2], els[3]))
            f.assert_is_equal(r[0], f.from_limb_vars(self.rx))
            f.assert_is_equal(r[1], f.from_limb_vars(self.ry))

    for A, Bp, want in cases:
        inst = C()
        ax, ay = coords(A)
        bx, by = coords(Bp)
        wx, wy = coords(want)
        inst.ins = limbs(ax) + limbs(ay) + limbs(bx) + limbs(by)
        inst.rx, inst.ry = limbs(wx), limbs(wy)
        assert is_solved(inst, F), (A, Bp)


def test_bls_g1_subgroup_check():
    """EIP-2537: MSM inputs must be r-torsion (reference
    sw_bls12381.AssertIsOnG1); a cofactor-component point must be
    rejected, the generator accepted."""
    import random as _r

    from gnark_tpu.constraint import solve as _solve
    from gnark_tpu.ec import curves as _curves, host as _host
    from gnark_tpu.std.algebra import sw_emulated as _sw

    C = _curves.CURVES["bls12_381"]
    p, r = C.fp.modulus, C.fr.modulus
    f1 = C.host_fp
    k = evm.BLS381_G1.fp.k

    def limbs(v):
        return [(v >> (emu.B * i)) & emu.MASK for i in range(k)]

    rng = _r.Random(1)
    while True:
        x = rng.randrange(p)
        y = pow((x ** 3 + 4) % p, (p + 1) // 4, p)
        if y * y % p == (x ** 3 + 4) % p:
            P = (x, y)
            if _host.ec_mul(f1, P, r) is not _host.INF:
                break

    class Chk(Circuit):
        px: list[Secret]
        py: list[Secret]

        def __init__(self, **kw):
            self.px = [None] * k
            self.py = [None] * k
            super().__init__(**kw)

        def define(self, api):
            cur = _sw.EmulatedCurve(api, evm.BLS381_G1)
            fe = cur.f
            pt = (fe.from_limb_vars(self.px), fe.from_limb_vars(self.py))
            cur.assert_on_curve(pt)
            evm.bls_g1_assert_subgroup(api, cur, pt)

    cs = compile_circuit(Chk(), F)
    g = C.g1
    pub, sec = witness(Chk(px=limbs(g[0]), py=limbs(g[1])), cs)
    _solve(cs, pub, sec)
    pub, sec = witness(Chk(px=limbs(P[0]), py=limbs(P[1])), cs)
    with pytest.raises(Exception):
        _solve(cs, pub, sec)
