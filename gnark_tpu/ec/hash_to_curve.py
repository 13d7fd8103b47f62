"""RFC 9380 hash-to-curve for BLS12-381 (host side).

Implements expand_message_xmd / hash_to_field (reference gnark-crypto
fp.Hash, used by std/evmprecompiles 0x10/0x11 via MapToG1/MapToG2 —
reference std/algebra/emulated/sw_bls12381/map_to_g1.go:175,
map_to_g2.go:189) and the full BLS12381G1_XMD:SHA-256_SSWU_RO_ /
...G2... suites: SSWU map, 11-/3-isogeny, cofactor clearing.

The isogeny coefficient tables in ec/sswu_data.py are DERIVED (not
copied): tools/derive_sswu.py computes the kernel polynomial from the
division polynomial of the published SSWU iso-curve and runs Velu's
formulas; see that file for the pinning of the curve-automorphism
ambiguity.
"""

from __future__ import annotations

import hashlib

P = 0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAAAB
R_ORDER = 52435875175126190479447740508185965837690552500527637822603658699938581184513
SEED = -0xD201000000010000        # BLS12-381 parameter z (negative)

G1_A = 0x144698A3B8E9433D693A02C96D4982B0EA985383EE66A8D8E8981AEFD881AC98936F8DA0E0F97F5CF428082D584C1D
G1_B = 0x12E2908D11688030018B12E8753EEE3B2016C1F0F24F4070A0B9C14FCEF35EF55A23215A316CEAA5D1CC48E98E172BE0
G1_Z = 11

G2_A = (0, 240)
G2_B = (1012, 1012)
G2_Z = (P - 2, P - 1)             # -(2 + i)


# ------------------------------------------------ expand_message_xmd --

def expand_message_xmd(msg: bytes, dst: bytes, n: int) -> bytes:
    """RFC 9380 section 5.3.1, H = SHA-256."""
    if len(dst) > 255:
        dst = b"H2C-OVERSIZE-DST-" + dst
        dst = hashlib.sha256(dst).digest()
    b_in_bytes = 32
    r_in_bytes = 64
    ell = -(-n // b_in_bytes)
    if ell > 255:
        raise ValueError("expand_message_xmd: length too large")
    dst_prime = dst + bytes([len(dst)])
    z_pad = bytes(r_in_bytes)
    l_i_b = n.to_bytes(2, "big")
    b0 = hashlib.sha256(z_pad + msg + l_i_b + b"\x00" + dst_prime).digest()
    b1 = hashlib.sha256(b0 + b"\x01" + dst_prime).digest()
    out = [b1]
    for i in range(2, ell + 1):
        prev = out[-1]
        xi = bytes(a ^ b for a, b in zip(b0, prev))
        out.append(hashlib.sha256(xi + bytes([i]) + dst_prime).digest())
    return b"".join(out)[:n]


def hash_to_field(msg: bytes, dst: bytes, count: int, m: int = 1,
                  ell: int = 64, p: int = P):
    """RFC 9380 section 5.2: count field elements of Fp^m."""
    data = expand_message_xmd(msg, dst, count * m * ell)
    out = []
    for i in range(count):
        el = []
        for j in range(m):
            off = ell * (j + i * m)
            el.append(int.from_bytes(data[off:off + ell], "big") % p)
        out.append(el[0] if m == 1 else tuple(el))
    return out


# -------------------------------------------------------- Fp helpers --

def _sqrt_fp(a):
    if a == 0:
        return 0
    if pow(a, (P - 1) // 2, P) != 1:
        return None
    return pow(a, (P + 1) // 4, P)


def _sgn0_fp(x) -> int:
    return x & 1


def _sgn0_fp2(x) -> int:
    """RFC 9380 4.1: sign of x0, or sign of x1 if x0 == 0."""
    s0 = x[0] & 1
    z0 = x[0] == 0
    s1 = x[1] & 1
    return s0 | (z0 and s1)


class _F2:
    """Fp[i]/(i^2+1) host arithmetic on pairs (c0, c1)."""

    @staticmethod
    def add(a, b):
        return ((a[0] + b[0]) % P, (a[1] + b[1]) % P)

    @staticmethod
    def sub(a, b):
        return ((a[0] - b[0]) % P, (a[1] - b[1]) % P)

    @staticmethod
    def neg(a):
        return ((-a[0]) % P, (-a[1]) % P)

    @staticmethod
    def mul(a, b):
        return ((a[0] * b[0] - a[1] * b[1]) % P,
                (a[0] * b[1] + a[1] * b[0]) % P)

    @staticmethod
    def sqr(a):
        return _F2.mul(a, a)

    @staticmethod
    def scale(a, k):
        return (a[0] * k % P, a[1] * k % P)

    @staticmethod
    def inv(a):
        d = pow(a[0] * a[0] + a[1] * a[1], -1, P)
        return (a[0] * d % P, (-a[1]) * d % P)

    @staticmethod
    def is_zero(a):
        return a[0] == 0 and a[1] == 0

    @staticmethod
    def conj(a):
        return (a[0], (-a[1]) % P)

    @staticmethod
    def sqrt(a):
        if _F2.is_zero(a):
            return (0, 0)
        x, y = a
        if y == 0:
            s = _sqrt_fp(x)
            if s is not None:
                return (s, 0)
            s = _sqrt_fp((-x) % P)
            return None if s is None else (0, s)
        n = (x * x + y * y) % P
        sn = _sqrt_fp(n)
        if sn is None:
            return None
        for sgn in (sn, (-sn) % P):
            c2 = (x + sgn) * pow(2, -1, P) % P
            c = _sqrt_fp(c2)
            if c is not None and c != 0:
                d = y * pow(2 * c, -1, P) % P
                if _F2.mul((c, d), (c, d)) == a:
                    return (c, d)
        return None


# ------------------------------------------------------ SSWU (generic) --

def _sswu_fp(u, a, b, z):
    """Simplified SWU map over Fp (RFC 9380 6.6.2, straight-line
    version F.2): u -> (x, y) on y^2 = x^3 + ax + b (the iso-curve)."""
    tv1 = u * u % P
    tv1 = z * tv1 % P
    tv2 = tv1 * tv1 % P
    tv2 = (tv2 + tv1) % P
    tv3 = (tv2 + 1) % P
    tv3 = b * tv3 % P
    tv4 = z if tv2 == 0 else (-tv2) % P
    tv4 = a * tv4 % P
    tv2 = tv3 * tv3 % P
    tv6 = tv4 * tv4 % P
    tv5 = a * tv6 % P
    tv2 = (tv2 + tv5) % P
    tv2 = tv2 * tv3 % P
    tv6 = tv6 * tv4 % P
    tv5 = b * tv6 % P
    tv2 = (tv2 + tv5) % P
    x = tv1 * tv3 % P
    is_gx1_square, y1 = _sqrt_ratio_fp(tv2, tv6, z)
    y = tv1 * u % P
    y = y * y1 % P
    if is_gx1_square:
        x = tv3
        y = y1
    if _sgn0_fp(u) != _sgn0_fp(y):
        y = (-y) % P
    x = x * pow(tv4, -1, P) % P
    return x, y


def _sqrt_ratio_fp(u, v, z):
    """(b, y): b = is u/v square; y = sqrt(u/v) or sqrt(Z*u/v)."""
    r = u * pow(v, -1, P) % P
    s = _sqrt_fp(r)
    if s is not None:
        return True, s
    s = _sqrt_fp(z * r % P)
    return False, s


def _sswu_fp2(u, a, b, z):
    """SSWU over Fp2 (pairs)."""
    F = _F2
    one = (1, 0)
    tv1 = F.sqr(u)
    tv1 = F.mul(z, tv1)
    tv2 = F.sqr(tv1)
    tv2 = F.add(tv2, tv1)
    tv3 = F.add(tv2, one)
    tv3 = F.mul(b, tv3)
    tv4 = z if F.is_zero(tv2) else F.neg(tv2)
    tv4 = F.mul(a, tv4)
    tv2 = F.sqr(tv3)
    tv6 = F.sqr(tv4)
    tv5 = F.mul(a, tv6)
    tv2 = F.add(tv2, tv5)
    tv2 = F.mul(tv2, tv3)
    tv6 = F.mul(tv6, tv4)
    tv5 = F.mul(b, tv6)
    tv2 = F.add(tv2, tv5)
    x = F.mul(tv1, tv3)
    ok, y1 = _sqrt_ratio_fp2(tv2, tv6, z)
    y = F.mul(tv1, u)
    y = F.mul(y, y1)
    if ok:
        x = tv3
        y = y1
    if _sgn0_fp2(u) != _sgn0_fp2(y):
        y = F.neg(y)
    x = F.mul(x, F.inv(tv4))
    return x, y


def _sqrt_ratio_fp2(u, v, z):
    F = _F2
    r = F.mul(u, F.inv(v))
    s = F.sqrt(r)
    if s is not None:
        return True, s
    s = F.sqrt(F.mul(z, r))
    assert s is not None
    return False, s


# ------------------------------------------------------- isogeny eval --

def eval_iso_fp(pt, xnum, xden, ynum, yden):
    """Evaluate the isogeny rational maps at an affine Fp point."""
    x, y = pt

    def ev(cs):
        r = 0
        for c in reversed(cs):
            r = (r * x + c) % P
        return r

    xn, xd, yn, yd = ev(xnum), ev(xden), ev(ynum), ev(yden)
    X = xn * pow(xd, -1, P) % P
    Y = y * yn % P * pow(yd, -1, P) % P
    return X, Y


def eval_iso_fp2(pt, xnum, xden, ynum, yden):
    F = _F2
    x, y = pt

    def ev(cs):
        r = (0, 0)
        for c in reversed(cs):
            r = F.add(F.mul(r, x), c)
        return r

    xn, xd, yn, yd = ev(xnum), ev(xden), ev(ynum), ev(yden)
    X = F.mul(xn, F.inv(xd))
    Y = F.mul(F.mul(y, yn), F.inv(yd))
    return X, Y


# ----------------------------------------------------- curve ops (Fp) --

def _ec_add_fp(Pt, Q, a=0):
    if Pt is None:
        return Q
    if Q is None:
        return Pt
    (x1, y1), (x2, y2) = Pt, Q
    if x1 == x2 and (y1 + y2) % P == 0:
        return None
    if x1 == x2:
        lam = (3 * x1 * x1 + a) * pow(2 * y1, -1, P) % P
    else:
        lam = (y2 - y1) * pow(x2 - x1, -1, P) % P
    x3 = (lam * lam - x1 - x2) % P
    return (x3, (lam * (x1 - x3) - y1) % P)


def _ec_mul_fp(Pt, k, a=0):
    R = None
    while k:
        if k & 1:
            R = _ec_add_fp(R, Pt, a)
        Pt = _ec_add_fp(Pt, Pt, a)
        k >>= 1
    return R


def _ec_add_fp2(Pt, Q, a=(0, 0)):
    F = _F2
    if Pt is None:
        return Q
    if Q is None:
        return Pt
    (x1, y1), (x2, y2) = Pt, Q
    if x1 == x2 and F.is_zero(F.add(y1, y2)):
        return None
    if x1 == x2:
        lam = F.mul(F.add(F.scale(F.sqr(x1), 3), a),
                    F.inv(F.scale(y1, 2)))
    else:
        lam = F.mul(F.sub(y2, y1), F.inv(F.sub(x2, x1)))
    x3 = F.sub(F.sub(F.sqr(lam), x1), x2)
    return (x3, F.sub(F.mul(lam, F.sub(x1, x3)), y1))


def _ec_mul_fp2(Pt, k, a=(0, 0)):
    R = None
    while k:
        if k & 1:
            R = _ec_add_fp2(R, Pt, a)
        Pt = _ec_add_fp2(Pt, Pt, a)
        k >>= 1
    return R


# ------------------------------------------------- cofactor clearing --

def clear_cofactor_g1(pt):
    """[h_eff] with h_eff = 1 - z = 0xd201000000010001 (eprint
    2019/403 section 5; reference map_to_g1.go:56-76 computes the same
    via a seed addition chain)."""
    return _ec_mul_fp(pt, 1 - SEED)


def _psi_constants():
    """Frobenius-twist constants for the psi endomorphism on the
    BLS12-381 M-twist E2: y^2 = x^3 + 4(1+i):
    psi(x, y) = (cx * conj(x), cy * conj(y)), cx = (1+i)^((p-2)/3)...
    computed as 1/(1+i)^((p-1)/3) and 1/(1+i)^((p-1)/2)."""
    F = _F2
    xi = (1, 1)
    cx = F.inv(_f2_pow(xi, (P - 1) // 3))
    cy = F.inv(_f2_pow(xi, (P - 1) // 2))
    return cx, cy


def _f2_pow(a, e):
    r = (1, 0)
    while e:
        if e & 1:
            r = _F2.mul(r, a)
        a = _F2.mul(a, a)
        e >>= 1
    return r


_PSI_CX, _PSI_CY = _psi_constants()


def psi_g2(pt):
    if pt is None:
        return None
    x, y = pt
    F = _F2
    return (F.mul(_PSI_CX, F.conj(x)), F.mul(_PSI_CY, F.conj(y)))


def clear_cofactor_g2(pt):
    """Budroni-Pintore psi-based clearing (eprint 2017/419; reference
    map_to_g2.go:94-121): exactly [h_eff] on the full curve."""
    z = -SEED                     # |z|; [z]P = -[|z|]P via y-negation?
    # scalarMulBySeed in the reference multiplies by the (negative)
    # seed: [c1]P with c1 = z = -|z|, i.e. negate after |z|-mult.

    def mul_seed(Q):
        R = _ec_mul_fp2(Q, z)
        return None if R is None else (R[0], _F2.neg(R[1]))

    t1 = mul_seed(pt)                       # [z]P
    t2 = psi_g2(pt)                         # psi(P)
    t3 = _ec_add_fp2(pt, pt)                # 2P
    t3 = psi_g2(psi_g2(t3))                 # psi^2(2P)
    t3 = _ec_add_fp2(t3, _neg2(t2))         # - psi(P)
    t2 = _ec_add_fp2(t1, t2)                # [z]P + psi(P)
    t2 = mul_seed(t2)                       # [z]([z]P + psi(P))
    t3 = _ec_add_fp2(t3, t2)
    t3 = _ec_add_fp2(t3, _neg2(t1))
    return _ec_add_fp2(t3, _neg2(pt))


def _neg2(pt):
    return None if pt is None else (pt[0], _F2.neg(pt[1]))


# ------------------------------------------------------- public maps --

def _g1_iso():
    from gnark_tpu.ec import sswu_data as d
    return d.G1_XNUM, d.G1_XDEN, d.G1_YNUM, d.G1_YDEN


def _g2_iso():
    from gnark_tpu.ec import sswu_data as d
    return d.G2_XNUM, d.G2_XDEN, d.G2_YNUM, d.G2_YDEN


def map_to_g1(u: int):
    """EIP-2537 0x10 MAP_FP_TO_G1 (reference 16-blsmaptog1.go:15):
    SSWU + 11-isogeny + cofactor clearing. Returns affine (x, y) or
    None (never None in practice: SSWU never yields the identity)."""
    pt = _sswu_fp(u % P, G1_A, G1_B, G1_Z)
    pt = eval_iso_fp(pt, *_g1_iso())
    return clear_cofactor_g1(pt)


def map_to_g2(u):
    """EIP-2537 0x11 MAP_FP2_TO_G2 (reference 17-blsmaptog2.go:14)."""
    u = (u[0] % P, u[1] % P)
    pt = _sswu_fp2(u, G2_A, G2_B, G2_Z)
    pt = eval_iso_fp2(pt, *_g2_iso())
    return clear_cofactor_g2(pt)


def hash_to_g1(msg: bytes, dst: bytes):
    """BLS12381G1_XMD:SHA-256_SSWU_RO_ (RFC 9380 8.8.1)."""
    u = hash_to_field(msg, dst, 2)
    q0 = eval_iso_fp(_sswu_fp(u[0], G1_A, G1_B, G1_Z), *_g1_iso())
    q1 = eval_iso_fp(_sswu_fp(u[1], G1_A, G1_B, G1_Z), *_g1_iso())
    return clear_cofactor_g1(_ec_add_fp(q0, q1))


def encode_to_g1(msg: bytes, dst: bytes):
    """BLS12381G1_XMD:SHA-256_SSWU_NU_ (EncodeToG1)."""
    u = hash_to_field(msg, dst, 1)
    return map_to_g1(u[0])


def hash_to_g2(msg: bytes, dst: bytes):
    """BLS12381G2_XMD:SHA-256_SSWU_RO_ (RFC 9380 8.8.2)."""
    u = hash_to_field(msg, dst, 2, m=2)
    q0 = eval_iso_fp2(_sswu_fp2(u[0], G2_A, G2_B, G2_Z), *_g2_iso())
    q1 = eval_iso_fp2(_sswu_fp2(u[1], G2_A, G2_B, G2_Z), *_g2_iso())
    return clear_cofactor_g2(_ec_add_fp2(q0, q1))


def encode_to_g2(msg: bytes, dst: bytes):
    u = hash_to_field(msg, dst, 1, m=2)
    return map_to_g2(u[0])
