"""In-circuit BW6-761 pairing over the EMULATED 761-bit base field.

Reference: std/algebra/emulated/sw_bw6761/pairing.go +
fields_bw6761/e6.go — the missing curve family for outer-of-outer
recursion (verify BW6-761 proofs inside e.g. a BN254 circuit).

Design (mirrors our emulated BN254/BLS12-381 circuits, fields_bn254.py):

  * Fp6 as the DIRECT sextic Fp[w]/(w^6 - xi) with xi = -4 — the same
    tower the host engine derives for bw6_761 (pairing/tate.py
    _find_xi: M-type, b2/b = 4/(-1) = -4), so host values are circuit
    constants verbatim. BW6's G1 AND G2 are both over Fp, so every
    tower coefficient is a single emulated Element (no Fp2 pairs).
  * Miller loop: the optimal Tate loop
    f_{(x0+1) + lambda*(x0^3-x0^2-x0), Q}(P) (Alg. 2 of
    eprint 2021/1359, reference pairing.go:416-646): one 190-digit
    double ladder where digit c1 adds +-Q and digit c2 adds
    +-phi(Q) = (omega*x, -y), omega a cube root of unity in Fp. The
    digit tables are DERIVED here from the BLS12-377 seed (bits of
    x0+1, 2-NAF of x0^3-x0^2-x0) rather than copied.
  * Lines in affine: R0 = lambda, R1 = lambda*x_T - y_T, evaluated at
    P as l = R1/y_P + (-R0*x_P/y_P) w^2 + w^3 (pairing.go:648-738).
    Line products use the generic Fp6 mul (sparse Mul023By023 /
    MulBy02345 fusions are a constraint-count TODO).
  * Final exponentiation: easy part (p^3-1)(p+1) via Frobenius + one
    inverse hint; hard part (x0+1)*(p^2-p+1)/r via a Shamir double
    ladder on (z, Frob(z)) — gnark's x0-addition-chain
    (e6_pairing.go) is a cheaper TODO.
"""

from __future__ import annotations

from gnark_tpu.constraint.hints import register_hint
from gnark_tpu.ec.curves import CURVES
from gnark_tpu.ec.curves_data import CURVES_DATA
from gnark_tpu.std.math import emulated as emu

P_MOD = emu.BW6_761_FP_EMU.modulus
R_MOD = CURVES_DATA["bw6_761"]["fr"]
XI = -4                      # w^6 = -4 (direct sextic nonresidue)
X0 = 0x8508C00000000001      # BLS12-377 seed (positive)

# cube root of unity acting on G2: phi(x, y) = (OMEGA*x, -y)
# (reference pairing.go:57 thirdRootOne; pinned by OMEGA^2+OMEGA+1=0)
OMEGA = int(
    "19689858240902092972786107397005771513976663823038257284507416115668"
    "00370218827257750865013421937292370006175842381275743914023380727582"
    "819905021229583192207421122272650305267822868639090213645505120388400"
    "344940985710520836292650")
assert (OMEGA * OMEGA + OMEGA + 1) % P_MOD == 0, "not a cube root of unity"


def _naf(n: int):
    out = []
    while n:
        if n & 1:
            d = 2 - (n % 4)
            out.append(d)
            n -= d
        else:
            out.append(0)
        n >>= 1
    return out


def _loop_digits():
    """(c1, c2) LSB-first digit lists of x0+1 (binary) and
    x0^3-x0^2-x0 (2-NAF), padded to equal length; the top digit of c2
    is 1 (the ladder starts at phi(Q))."""
    c1 = [int(b) for b in bin(X0 + 1)[2:]][::-1]
    c2 = _naf(X0 ** 3 - X0 ** 2 - X0)
    n = max(len(c1), len(c2))
    c1 += [0] * (n - len(c1))
    c2 += [0] * (n - len(c2))
    assert c2[-1] == 1 and c1[-1] == 0
    # combined scalar kills r: (x0+1) + lam*(x0^3-x0^2-x0) = 0 mod r
    # for lam the eigenvalue of phi(x,y) = (OMEGA*x, -y) on G2 — a
    # primitive 6th root of unity mod r (cube root composed with -1):
    # lam^2 - lam + 1 = 0
    lam = next(l for l in _sixth_roots_mod_r() if
               ((X0 + 1) + l * (X0 ** 3 - X0 ** 2 - X0)) % R_MOD == 0)
    assert lam
    return c1, c2


def _sixth_roots_mod_r():
    # roots of l^2 - l + 1 mod r
    s = _sqrt_mod(R_MOD - 3, R_MOD)
    inv2 = pow(2, -1, R_MOD)
    return [(1 + s) * inv2 % R_MOD, (1 - s) * inv2 % R_MOD]


def _sqrt_mod(a, p):
    # Tonelli-Shanks
    a %= p
    q, s = p - 1, 0
    while q % 2 == 0:
        q //= 2
        s += 1
    z = 2
    while pow(z, (p - 1) // 2, p) != p - 1:
        z += 1
    m, c, t, r = s, pow(z, q, p), pow(a, q, p), pow(a, (q + 1) // 2, p)
    while t != 1:
        i, tt = 0, t
        while tt != 1:
            tt = tt * tt % p
            i += 1
        b = pow(c, 1 << (m - i - 1), p)
        m, c = i, b * b % p
        t, r = t * c % p, r * b % p
    return r


C1, C2 = _loop_digits()

# Frobenius constants: w^(p^k) = gamma_k[i] * w^i with
# gamma_k[i] = xi^(i*(p^k-1)/6) in Fp (coords are Fp, fixed by p)
def _frob_consts(k: int):
    e = (P_MOD ** k - 1) // 6
    x = XI % P_MOD
    return [pow(x, i * e, P_MOD) for i in range(6)]


FROB1 = _frob_consts(1)
FROB3 = _frob_consts(3)

# final exponentiation exponents: easy (p^3-1)(p+1), then hard part
# (x0+1)*(p^2-p+1)/r split base-p for the Shamir ladder
EASY_EXP = (P_MOD ** 3 - 1) * (P_MOD + 1)
PHI6 = P_MOD * P_MOD - P_MOD + 1
assert PHI6 % R_MOD == 0
D0 = ((X0 + 1) * (PHI6 // R_MOD)) % P_MOD
D1 = ((X0 + 1) * (PHI6 // R_MOD)) // P_MOD
assert D1 < P_MOD


def _host_ext():
    """Host Fp6 with OUR xi = -4 (the generic host engine's _find_xi
    picks the isomorphic-but-different xi = -1/4 D-tower; the
    gnark-compatible direct sextic needs w^6 = -4 so that
    psi(x, y) = (x w^2, y w^3) embeds G1 into E'(Fp6))."""
    from gnark_tpu.ec.host import Fp
    from gnark_tpu.pairing.tate import ExtField
    return ExtField(Fp(P_MOD), 6, (-4) % P_MOD)


@register_hint("bw6_fp6_inv")
def _fp6_inv_hint(q, inputs):
    """[k, 6 coords x k limbs] -> inverse coords (6*k limbs)."""
    k = inputs[0]
    ext = _host_ext()
    vals = [emu._val(inputs, k, 1 + k * i) % P_MOD for i in range(6)]
    out = ext.inv(tuple(vals))
    limbs = []
    for v in out:
        limbs += [(v >> (emu.B * i)) & emu.MASK for i in range(k)]
    return limbs


class EF6:
    """Emulated direct sextic Fp6 = Fp[w]/(w^6 - XI); elements are
    6-tuples of emulated-Fp Elements."""

    def __init__(self, api, fe: emu.EmulatedField | None = None):
        self.api = api
        self.fe = fe or emu.EmulatedField(api, emu.BW6_761_FP_EMU)
        z, o = self.fe.zero, self.fe.one
        self.zero = (z,) * 6
        self.one = (o, z, z, z, z, z)

    def from_const(self, coords) -> tuple:
        return tuple(self.fe.from_const(c) for c in coords)

    def add(self, a, b):
        fe = self.fe
        return tuple(fe.add(x, y) for x, y in zip(a, b))

    def _prod_coeff(self, a, b, k):
        """sum_{i+j=k} a_i b_j + XI * sum_{i+j=k+6} a_i b_j."""
        prods = []
        for i in range(6):
            j = k - i
            if 0 <= j < 6:
                prods.append((1, a[i], b[j]))
            j = k + 6 - i
            if 0 <= j < 6:
                prods.append((XI, a[i], b[j]))
        return self.fe.sum_of_products(prods)

    def mul(self, a, b):
        return tuple(self._prod_coeff(a, b, k) for k in range(6))

    def sqr(self, a):
        return self.mul(a, a)

    def conj(self, a):
        """w -> -w (the p^3 Frobenius on unitary elements)."""
        fe = self.fe
        return tuple(c if i % 2 == 0 else fe.neg(c)
                     for i, c in enumerate(a))

    def frobenius(self, a, consts=FROB1):
        """Coordinate-wise gamma_i multiply (coords are Fp, fixed by
        the p-power map); gammas are full-width field constants."""
        fe = self.fe
        return tuple(
            c if g == 1 else fe.neg(c) if g == P_MOD - 1
            else fe.mul(c, fe.from_const(g))
            for c, g in zip(a, consts))

    def inv(self, a):
        api, fe = self.api, self.fe
        k = fe.k
        flat = [l for c in a for l in c.limbs]
        outs = api.new_hint("bw6_fp6_inv", 6 * k, k, *flat)
        r = tuple(fe.from_limb_vars(outs[i * k:(i + 1) * k])
                  for i in range(6))
        self.assert_eq(self.mul(a, r), self.one)
        return r

    def assert_eq(self, a, b):
        fe = self.fe
        for x, y in zip(a, b):
            d = fe.sum_of_products(lins=[(1, x), (-1, y)])
            for l in d.limbs:
                self.api.assert_is_equal(l, 0)

    def pow2_ladder(self, z, zf, d0: int, d1: int):
        """z^d0 * zf^d1 via a Shamir double ladder (shared squarings)."""
        both = self.mul(z, zf)
        table = {(0, 1): zf, (1, 0): z, (1, 1): both}
        n = max(d0.bit_length(), d1.bit_length())
        acc = None
        for i in range(n - 1, -1, -1):
            if acc is not None:
                acc = self.sqr(acc)
            bits = ((d0 >> i) & 1, (d1 >> i) & 1)
            if bits != (0, 0):
                acc = table[bits] if acc is None \
                    else self.mul(acc, table[bits])
        return acc if acc is not None else self.one


class PairingBW6761:
    def __init__(self, api):
        self.api = api
        self.f6 = EF6(api)
        self.fe = self.f6.fe
        c = CURVES["bw6_761"]
        self.curve = c
        self.omega = self.fe.from_const(OMEGA)

    # -- wellformedness -----------------------------------------------------

    def assert_on_g1(self, P):
        self._assert_on_curve(P, self.curve.b % P_MOD)

    def assert_on_g2_curve(self, Q):
        self._assert_on_curve(Q, self.curve.b2 % P_MOD)

    def _assert_on_curve(self, P, b):
        x, y = P
        fe = self.fe
        if b > P_MOD // 2:
            b -= P_MOD          # signed small representative (-1 for G1)
        x2 = fe.mul(x, x)
        d = fe.sum_of_products([(1, y, y), (-1, x2, x)], const=-b)
        for l in d.limbs:
            self.api.assert_is_equal(l, 0)

    # -- affine steps (pairing.go:648-738) ----------------------------------

    def _double_step(self, T):
        fe = self.fe
        x, y = T
        x2 = fe.mul(x, x)
        lam = fe.div(fe.mul_const(x2, 3), fe.mul_const(y, 2))
        xr = fe.sum_of_products([(1, lam, lam)], lins=[(-2, x)])
        yr = fe.sum_of_products([(1, lam, fe.sub(x, xr))],
                                lins=[(-1, y)])
        return (xr, yr), (lam, self._r1(lam, x, y))

    def _tangent(self, T):
        fe = self.fe
        x, y = T
        x2 = fe.mul(x, x)
        lam = fe.div(fe.mul_const(x2, 3), fe.mul_const(y, 2))
        return (lam, self._r1(lam, x, y))

    def _r1(self, lam, x, y):
        return self.fe.sum_of_products([(1, lam, x)], lins=[(-1, y)])

    def _double_and_add_step(self, T, Q, is_sub: bool):
        fe = self.fe
        x1, y1 = T
        x2, y2 = Q
        n = fe.add(y1, y2) if is_sub else fe.sub(y1, y2)
        l1 = fe.div(n, fe.sub(x1, x2))
        x3 = fe.sum_of_products([(1, l1, l1)],
                                lins=[(-1, x1), (-1, x2)])
        line1 = (l1, self._r1(l1, x1, y1))
        l2 = fe.add(l1, fe.div(fe.mul_const(y1, 2), fe.sub(x3, x1)))
        x4 = fe.sum_of_products([(1, l2, l2)],
                                lins=[(-1, x1), (-1, x3)])
        y4 = fe.sum_of_products([(1, l2, fe.sub(x4, x1))],
                                lins=[(-1, y1)])
        line2 = (fe.neg(l2),
                 fe.sum_of_products([(-1, l2, x1)], lins=[(-1, y1)]))
        return (x4, y4), line1, line2

    # -- Miller loop ---------------------------------------------------------

    def _line_e6(self, line, yinv, xnoy):
        """Line (R0,R1) evaluated at P -> full E6 element
        R1/y + (-R0 x/y) w^2 + w^3."""
        fe = self.fe
        r0, r1 = line
        z = fe.zero
        return (fe.mul(r1, yinv), z, fe.mul(r0, xnoy), fe.one, z, z)

    def miller_loop(self, pairs):
        f6, fe = self.f6, self.fe
        st = []
        for P, Q in pairs:
            xq, yq = Q
            im = (fe.mul(xq, self.omega), fe.neg(yq))
            yinv = fe.inverse(P[1])
            xnoy = fe.neg(fe.mul(P[0], yinv))
            st.append({"Q": Q, "im": im, "T": im,
                       "yinv": yinv, "xnoy": xnoy})
        f = None
        for i in range(len(C1) - 2, 0, -1):
            if f is not None:
                f = f6.sqr(f)
            d = C1[i] + 3 * C2[i]
            for s in st:
                if d == 0:
                    s["T"], line = self._double_step(s["T"])
                    lines = [line]
                else:
                    pt = s["Q"] if abs(d) == 1 else s["im"]
                    s["T"], l1, l2 = self._double_and_add_step(
                        s["T"], pt, d < 0)
                    lines = [l1, l2]
                for ln in lines:
                    le = self._line_e6(ln, s["yinv"], s["xnoy"])
                    f = le if f is None else f6.mul(f, le)
        # i = 0: digit -3; acc = infinity next, tangent only
        f = f6.sqr(f)
        for s in st:
            le = self._line_e6(self._tangent(s["T"]),
                               s["yinv"], s["xnoy"])
            f = f6.mul(f, le)
        return f

    # -- final exponentiation -------------------------------------------------

    def final_exp(self, z):
        f6 = self.f6
        # easy part: z^((p^3-1)(p+1)) — one inverse, two Frobenius
        zi = f6.inv(z)
        t = f6.mul(f6.frobenius(z, FROB3), zi)       # z^(p^3-1)
        t = f6.mul(f6.frobenius(t, FROB1), t)        # ^(p+1)
        # hard part: ^((x0+1) * (p^2-p+1)/r), base-p Shamir ladder
        return f6.pow2_ladder(t, f6.frobenius(t, FROB1), D0, D1)

    def pair(self, P, Q):
        return self.final_exp(self.miller_loop([(P, Q)]))

    def pairing_check(self, pairs):
        res = self.final_exp(self.miller_loop(pairs))
        self.f6.assert_eq(res, self.f6.one)


# -- host mirror (test oracle + host-side verification) -----------------------

def host_miller_loop(P, Q):
    """Host-int mirror of the circuit Miller loop (same tower)."""
    ext = _host_ext()
    xq, yq = Q[0] % P_MOD, Q[1] % P_MOD
    im = (OMEGA * xq % P_MOD, (-yq) % P_MOD)
    xp, yp = P[0] % P_MOD, P[1] % P_MOD
    yinv = pow(yp, -1, P_MOD)
    xnoy = (-xp * yinv) % P_MOD

    def line_e6(lam, xt, yt):
        r1 = (lam * xt - yt) % P_MOD
        return (r1 * yinv % P_MOD, 0, lam * xnoy % P_MOD, 1, 0, 0)

    def dbl(T):
        x, y = T
        lam = 3 * x * x % P_MOD * pow(2 * y % P_MOD, -1, P_MOD) % P_MOD
        xr = (lam * lam - 2 * x) % P_MOD
        yr = (lam * (x - xr) - y) % P_MOD
        return (xr, yr), line_e6(lam, x, y)

    def dbl_add(T, A, is_sub):
        x1, y1 = T
        x2, y2 = A
        n = (y1 + y2) if is_sub else (y1 - y2)
        l1 = n % P_MOD * pow((x1 - x2) % P_MOD, -1, P_MOD) % P_MOD
        x3 = (l1 * l1 - x1 - x2) % P_MOD
        line1 = line_e6(l1, x1, y1)
        l2 = (l1 + 2 * y1 * pow((x3 - x1) % P_MOD, -1, P_MOD)) % P_MOD
        x4 = (l2 * l2 - x1 - x3) % P_MOD
        y4 = (l2 * (x4 - x1) - y1) % P_MOD
        lam2 = (-l2) % P_MOD
        r1 = (-(l2 * x1) - y1) % P_MOD
        line2 = (r1 * yinv % P_MOD, 0, lam2 * xnoy % P_MOD, 1, 0, 0)
        return (x4, y4), line1, line2

    T = im
    f = ext.one
    for i in range(len(C1) - 2, 0, -1):
        f = ext.sqr(f)
        d = C1[i] + 3 * C2[i]
        if d == 0:
            T, le = dbl(T)
            f = ext.mul(f, le)
        else:
            A = (xq, yq) if abs(d) == 1 else im
            T, l1, l2 = dbl_add(T, A, d < 0)
            f = ext.mul(ext.mul(f, l1), l2)
    f = ext.sqr(f)
    x, y = T
    lam = 3 * x * x % P_MOD * pow(2 * y % P_MOD, -1, P_MOD) % P_MOD
    return ext.mul(f, line_e6(lam, x, y))


def host_pair(P, Q):
    ext = _host_ext()
    f = host_miller_loop(P, Q)
    # easy + hard (same exponents as the circuit)
    from gnark_tpu.pairing.tate import pow_in
    z = pow_in(ext, f, EASY_EXP)
    return pow_in(ext, z, D0 + D1 * P_MOD)
