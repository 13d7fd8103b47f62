"""Derive the RFC 9380 SSWU isogeny maps for BLS12-381 G1/G2 from
first principles — no copied coefficient tables.

The reference implements MapToG1/MapToG2 (EIP-2537 precompiles 0x10 and
0x11, reference std/evmprecompiles/16-blsmaptog1.go:15 and
17-blsmaptog2.go:14) by importing gnark-crypto's hash_to_curve constant
tables. We instead DERIVE everything:

  G1:  E1': y^2 = x^3 + A1'x + B1'  (the Wahby-Boneh 11-isogenous
       curve; A1'/B1' and Z=11 are the published SSWU suite parameters)
       * compute the 11-division polynomial psi_11 of E1' (degree 60);
       * factor out its unique rational degree-5 kernel polynomial h
         (distinct-degree factorization + Cantor-Zassenhaus over Fp);
       * Velu/Kohel: with v(x) = 6x^2 + 2A', u(x) = 4(x^3 + A'x + B'),
         V = (v * h') mod h, U = (u * h') mod h, the normalized
         degree-11 isogeny is
             x_map = x + V/h + (U h' - U' h)/h^2
                   = x_num / h^2,
             y_map = y * d(x_map)/dx = y * (x_num' h - 2 x_num h')/h^3
         (sum-over-kernel identities: for kernel roots x_Q of h,
          sum v(x_Q)/(x-x_Q) = ((v h') mod h)/h and
          sum u(x_Q)/(x-x_Q)^2 = (U h' - U' h)/h^2 with U=(u h') mod h);
       * the codomain y^2 = x^3 + b'' has j = 0; compose with the
         isomorphism (x, y) -> (c^2 x, c^3 y), c^6 = 4/b'', to land on
         E: y^2 = x^3 + 4. The 6 roots c (Fp contains zeta_6) give the
         6 automorphism-twisted candidate maps; the RFC map is pinned
         by checking the full BLS12381G1_XMD:SHA-256_SSWU_RO_ pipeline
         against the RFC 9380 J.9.1 test vector.

  G2:  same over Fp2 with E2': y^2 = x^3 + 240i x + (1012 + 1012i),
       Z = -(2 + i), degree-3 isogeny (kernel polynomial x - x0 with
       x0 in Fp2 a root of the 3-division polynomial
       3x^4 + 6A'x^2 + 12B'x - A'^2).

Writes gnark_tpu/ec/sswu_data.py. Run: python tools/derive_sswu.py
"""

from __future__ import annotations

import random
import sys

sys.setrecursionlimit(10000)

P = 0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAAAB
R_ORDER = 52435875175126190479447740508185965837690552500527637822603658699938581184513

# SSWU suite parameters (RFC 9380 8.8.1 / Wahby-Boneh 2019): the
# 11-isogenous curve E1' and Z for G1; the 3-isogenous curve E2' and
# Z' for G2. These are the only remembered inputs; everything else is
# derived and then validated against the RFC round-trip test vector.
G1_A = 0x144698A3B8E9433D693A02C96D4982B0EA985383EE66A8D8E8981AEFD881AC98936F8DA0E0F97F5CF428082D584C1D
G1_B = 0x12E2908D11688030018B12E8753EEE3B2016C1F0F24F4070A0B9C14FCEF35EF55A23215A316CEAA5D1CC48E98E172BE0
G1_Z = 11

G2_A = (0, 240)           # 240*i
G2_B = (1012, 1012)       # 1012*(1+i)
G2_Z = (P - 2, P - 1)     # -(2+i)


# ---------------------------------------------------------------- Fp --

def fadd(a, b):
    return (a + b) % P


def fmul(a, b):
    return (a * b) % P


def finv(a):
    return pow(a, -1, P)


# ------------------------------------------------------- Fp[x] (dense) --

def pnorm(f):
    while f and f[-1] == 0:
        f.pop()
    return f


def padd(f, g):
    n = max(len(f), len(g))
    return pnorm([((f[i] if i < len(f) else 0) +
                   (g[i] if i < len(g) else 0)) % P for i in range(n)])


def psub(f, g):
    n = max(len(f), len(g))
    return pnorm([((f[i] if i < len(f) else 0) -
                   (g[i] if i < len(g) else 0)) % P for i in range(n)])


def pmul(f, g):
    if not f or not g:
        return []
    out = [0] * (len(f) + len(g) - 1)
    for i, a in enumerate(f):
        if a:
            for j, b in enumerate(g):
                out[i + j] += a * b
    return pnorm([c % P for c in out])


def pscale(f, k):
    k %= P
    return pnorm([c * k % P for c in f])


def pmod(f, g):
    """f mod g (g monic-izable)."""
    f = list(f)
    dg = len(g) - 1
    lg = finv(g[-1])
    while len(f) - 1 >= dg and f:
        c = f[-1] * lg % P
        s = len(f) - 1 - dg
        for i in range(dg + 1):
            f[s + i] = (f[s + i] - c * g[i]) % P
        pnorm(f)
    return f


def pdivmod(f, g):
    f = list(f)
    dg = len(g) - 1
    lg = finv(g[-1])
    q = [0] * max(len(f) - dg, 0)
    while len(f) - 1 >= dg and f:
        c = f[-1] * lg % P
        s = len(f) - 1 - dg
        q[s] = c
        for i in range(dg + 1):
            f[s + i] = (f[s + i] - c * g[i]) % P
        pnorm(f)
    return pnorm(q), f


def pgcd(f, g):
    while g:
        f, g = g, pmod(f, g)
    if f:
        f = pscale(f, finv(f[-1]))
    return f


def pdiff(f):
    return pnorm([f[i] * i % P for i in range(1, len(f))])


def ppowmod(base, e, mod):
    r = [1]
    base = pmod(base, mod)
    while e:
        if e & 1:
            r = pmod(pmul(r, base), mod)
        base = pmod(pmul(base, base), mod)
        e >>= 1
    return r


def peval(f, x):
    r = 0
    for c in reversed(f):
        r = (r * x + c) % P
    return r


# ------------------------------------------- division polynomial psi_11 --

def division_poly(ell, a, b):
    """psi_ell for y^2 = x^3 + ax + b as a polynomial in x alone (ell
    odd). Uses the standard recurrence with y^2 eliminated: psi_m for
    even m carries a formal factor 2y whose square is 4F,
    F = x^3 + ax + b (Washington, Elliptic Curves, 3.2)."""
    F = [b % P, a % P, 0, 1]
    F4 = pscale(F, 4)
    # represent psi_m = f_m(x) * (2y)^{e_m}, e_m = 1 if m even else 0
    f = {1: [1], 2: [1],
         3: pnorm([(-(a * a)) % P, 12 * b % P, 6 * a % P, 0, 3]),
         # psi_4 = 4y(x^6+5ax^4+20bx^3-5a^2x^2-4abx-8b^2-a^3) = 2y*f_4
         4: pscale(pnorm([(-(a ** 3) - 8 * b * b) % P, (-4 * a * b) % P,
                          (-5 * a * a) % P, 20 * b % P, 5 * a % P, 0, 1]),
                   2)}

    def F_(m):
        if m in f:
            return f[m]
        k = m // 2
        if m & 1:
            A_ = pmul(F_(k + 2), pmul(F_(k), pmul(F_(k), F_(k))))
            B_ = pmul(F_(k - 1), pmul(F_(k + 1),
                                      pmul(F_(k + 1), F_(k + 1))))
            if k & 1:               # psi_{k+2},psi_k odd: A_ y-free;
                # B_ carries (2y)^4 -> (4F)^2
                B_ = pmul(B_, pmul(F4, F4))
            else:                   # A_ carries (2y)^4
                A_ = pmul(A_, pmul(F4, F4))
            r = psub(A_, B_)
        else:
            # psi_{2k} = psi_k (psi_{k+2} psi_{k-1}^2
            #                   - psi_{k-2} psi_{k+1}^2) / (2y)
            A_ = pmul(F_(k + 2), pmul(F_(k - 1), F_(k - 1)))
            B_ = pmul(F_(k - 2), pmul(F_(k + 1), F_(k + 1)))
            # k even: psi_{k+2}(2y), psi_{k-1} free -> A_ ~ (2y);
            #         psi_{k-2}(2y), psi_{k+1} free -> B_ ~ (2y);
            # k odd:  psi_{k-1}^2 ~ (2y)^2, psi_{k+2} free -> A_ ~(2y)^2
            # ... dividing the defining relation by (2y): with our
            # f-parts, for k even both A_,B_ already carry exactly the
            # f-parts (the single (2y) on each cancels the divisor);
            # for k odd both carry (2y)^2 -> one 4F remains after /(2y)
            # ... except e_{2k} = 1 absorbs one (2y).
            r = pmul(F_(k), psub(A_, B_))
            if k & 1:
                # A_,B_ each ~ (2y)^2 = 4F; / (2y) leaves (2y): matches
                # e_{2k}=1 only if we multiply the f-part by 4F/(4F)...
                r = pmul(r, F4)
                r, rem = pdivmod(r, F4)
                assert not rem
        f[m] = r
        return r

    if ell % 2 == 0:
        raise ValueError("odd ell only")
    return F_(ell)


def factor_degree(f, d):
    """All monic irreducible degree-d factors of squarefree f (monic)."""
    # distinct-degree: g_d = gcd(x^(p^d) - x mod f, f) after removing
    # lower-degree parts
    f = pscale(f, finv(f[-1]))
    x = [0, 1]
    h = list(x)
    fs = list(f)
    for k in range(1, d):
        h = ppowmod(h, P, fs)
        g = pgcd(psub(h, x), fs)
        if g and len(g) > 1:
            fs, rem = pdivmod(fs, g)
            assert not rem
        h = pmod(h, fs)
    h = ppowmod(h, P, fs)
    prod = pgcd(psub(h, x), fs)
    out = []
    # equal-degree (Cantor-Zassenhaus) on prod: all factors have deg d
    stack = [prod]
    rng = random.Random(0xDEF)
    while stack:
        g = stack.pop()
        if len(g) - 1 == 0:
            continue
        if len(g) - 1 == d:
            out.append(pscale(g, finv(g[-1])))
            continue
        while True:
            a = [rng.randrange(P) for _ in range(len(g) - 1)]
            a = pnorm(a) or [1]
            e = (pow(P, d) - 1) // 2
            b = ppowmod(a, e, g)
            c = pgcd(psub(b, [1]), g)
            if c and 0 < len(c) - 1 < len(g) - 1:
                q, rem = pdivmod(g, c)
                assert not rem
                stack += [c, q]
                break
    return out


def velu_from_kernel(h, a, b):
    """Normalized odd-degree isogeny from kernel polynomial h (monic,
    roots = kernel x-coords) on y^2 = x^3 + ax + b.
    Returns (x_num, x_den, y_num, y_den, a2, b2)."""
    d = len(h) - 1
    hp = pdiff(h)
    v = [2 * a % P, 0, 6]                     # 6x^2 + 2a
    u = pscale([b, a, 0, 1], 4)               # 4(x^3+ax+b)
    V = pmod(pmul(v, hp), h)
    U = pmod(pmul(u, hp), h)
    # x_map = x + V/h + (U h' - U' h)/h^2 = x_num / h^2
    h2 = pmul(h, h)
    x_num = padd(pmul([0, 1], h2), padd(pmul(V, h),
                                        psub(pmul(U, hp),
                                             pmul(pdiff(U), h))))
    # y_map = y * (x_num' h - 2 x_num h') / h^3
    y_num = psub(pmul(pdiff(x_num), h), pscale(pmul(x_num, hp), 2))
    y_den = pmul(h2, h)
    # codomain: a2 = a - 5t, b2 = b - 7w with power sums from h
    # t = sum(6 x_Q^2 + 2a), w = sum(4(x_Q^3+a x_Q+b) + x_Q(6x_Q^2+2a))
    #   = sum(10 x_Q^3 + 6 a x_Q + 4b)  over the d kernel x-coords
    # h = x^d + c_{d-1}x^{d-1} + ... ; e_k = (-1)^k * c_{d-k}
    e = [(-1) ** k * h[d - k] % P for k in range(1, d + 1)] \
        if d >= 1 else []
    # Newton: p1=e1; p2=e1 p1 - 2e2; p3 = e1 p2 - e2 p1 + 3e3
    e1 = e[0] if d >= 1 else 0
    e2 = e[1] if d >= 2 else 0
    e3 = e[2] if d >= 3 else 0
    p1 = e1
    p2 = (e1 * p1 - 2 * e2) % P
    p3 = (e1 * p2 - e2 * p1 + 3 * e3) % P
    t = (6 * p2 + 2 * a * d) % P
    w = (10 * p3 + 6 * a * p1 + 4 * b * d) % P
    a2 = (a - 5 * t) % P
    b2 = (b - 7 * w) % P
    return x_num, pmul(h, h), y_num, y_den, a2, b2


def nth_root(a, n, p=P):
    """One n-th root of a mod p (AMM for prime factors of n), or None."""
    if a == 0:
        return 0
    for q in _prime_factors(n):
        a = _prime_root(a, q, p)
        if a is None:
            return None
    return a


def _prime_factors(n):
    out = []
    d = 2
    while d * d <= n:
        while n % d == 0:
            out.append(d)
            n //= d
        d += 1
    if n > 1:
        out.append(n)
    return out


def _prime_root(a, q, p):
    """q-th root mod p (q prime) via Adleman-Manders-Miller; None if a
    is not a q-th power."""
    a %= p
    if a == 0:
        return 0
    if (p - 1) % q:
        return pow(a, pow(q, -1, p - 1), p)
    if pow(a, (p - 1) // q, p) != 1:
        return None
    s, t = 0, p - 1                 # p-1 = q^s * t, q !| t
    while t % q == 0:
        s += 1
        t //= q
    rng = random.Random(7)
    while True:                     # q-th nonresidue -> subgroup gen
        eta = rng.randrange(2, p)
        if pow(eta, (p - 1) // q, p) != 1:
            break
    g = pow(eta, t, p)              # order q^s
    # x0 = a^e with e = q^{-1} mod t: x0^q = a^{1+kt}, so the error
    # term x0^q / a = (a^t)^k lies in the order-q^s subgroup <g>
    e = pow(q, -1, t)
    x = pow(a, e, p)
    err = pow(x, q, p) * pow(a, p - 2, p) % p
    if err != 1:
        dl = _dlog_prime_power(err, g, q, s, p)
        if dl % q:
            return None
        x = x * pow(g, (p - 1 - dl // q) % (p - 1), p) % p
    assert pow(x, q, p) == a
    return x


def _dlog_prime_power(h, g, q, s, p):
    """dlog of h base g where ord(g) = q^s (Pohlig-Hellman), small q."""
    x = 0
    gamma = pow(g, pow(q, s - 1, p - 1), p)   # order q
    for k in range(s):
        hk = pow(h * pow(g, p - 1 - x, p) % p, pow(q, s - 1 - k), p)
        # solve gamma^d = hk, d in [0,q)
        d = 0
        cur = 1
        while cur != hk:
            cur = cur * gamma % p
            d += 1
            if d > q:
                raise RuntimeError("dlog fail")
        x += d * q ** k
    return x


def _kernel_from_rational_roots(roots, a, b):
    """If the kernel x-coords are individually rational (Frobenius acts
    as +-1 on the subgroup), group 5 of the linear roots into one
    kernel: lift a root to a point Q over Fp2 (y may be irrational) and
    take x-coords of Q..5Q. Affine EC arithmetic over Fp2."""
    F2 = _Fp2()
    a2, b2 = F2.from_int(a), F2.from_int(b)

    def ecadd(Pt, Q):
        if Pt is None:
            return Q
        if Q is None:
            return Pt
        (x1, y1), (x2, y2) = Pt, Q
        if x1 == x2 and F2.is_zero(F2.add(y1, y2)):
            return None
        if x1 == x2:
            num = F2.add(F2.scale(F2.mul(x1, x1), 3), a2)
            den = F2.scale(y1, 2)
        else:
            num = F2.sub(y2, y1)
            den = F2.sub(x2, x1)
        lam = F2.mul(num, F2.inv(den))
        x3 = F2.sub(F2.sub(F2.mul(lam, lam), x1), x2)
        y3 = F2.sub(F2.mul(lam, F2.sub(x1, x3)), y1)
        return (x3, y3)

    kernels = []
    used = set()
    for x1 in roots:
        if x1 in used:
            continue
        rhs = (x1 * x1 % P * x1 + a * x1 + b) % P
        y1 = F2.sqrt(F2.from_int(rhs))
        Q = ((x1, 0), y1)
        xs = []
        R = None
        for _ in range(5):
            R = ecadd(R, Q)
            assert R is not None
            assert R[0][1] == 0, "kernel x-coord not rational?"
            xs.append(R[0][0])
        assert len(set(xs)) == 5
        used.update(xs)
        h = [1]
        for xq in xs:
            h = pmul(h, [(-xq) % P, 1])
        kernels.append(h)
    return kernels


def _check_iso_curve_order():
    """|E1'(Fp)| must equal |E(Fp)| = h1*r (isogenous curves have equal
    point counts) — independently validates the remembered A'/B'."""
    h1 = 76329603384216526031706109802092473003
    n = h1 * R_ORDER
    rng = random.Random(99)
    while True:
        x = rng.randrange(P)
        rhs = (pow(x, 3, P) + G1_A * x + G1_B) % P
        y = _sqrt_fp(rhs)
        if y is not None:
            break

    def ecadd(Pt, Q):
        if Pt is None:
            return Q
        if Q is None:
            return Pt
        (x1, y1), (x2, y2) = Pt, Q
        if x1 == x2 and (y1 + y2) % P == 0:
            return None
        if x1 == x2:
            lam = (3 * x1 * x1 + G1_A) * finv(2 * y1) % P
        else:
            lam = (y2 - y1) * finv(x2 - x1) % P
        x3 = (lam * lam - x1 - x2) % P
        return (x3, (lam * (x1 - x3) - y1) % P)

    R_, Qp = None, (x, y)
    e = n
    while e:
        if e & 1:
            R_ = ecadd(R_, Qp)
        Qp = ecadd(Qp, Qp)
        e >>= 1
    assert R_ is None, "|E1'| != h1*r — remembered iso-curve is wrong!"
    print("iso-curve order check: |E1'(Fp)| == h1*r  OK", flush=True)


def derive_g1():
    _check_iso_curve_order()
    print("psi_11 ...", flush=True)
    psi11 = division_poly(11, G1_A, G1_B)
    assert len(psi11) - 1 == 60, len(psi11) - 1
    print("factor degree-5 kernels ...", flush=True)
    kers = factor_degree(psi11, 5)
    if not kers:
        print("  no irreducible degree-5 factor; trying rational roots")
        lin = factor_degree(psi11, 1)
        roots = [(-f[0]) % P for f in lin]
        kers = _kernel_from_rational_roots(roots, G1_A, G1_B)
    print(f"  {len(kers)} candidate kernel(s)")
    results = []
    for h in kers:
        xn, xd, yn, yd, a2, b2 = velu_from_kernel(h, G1_A, G1_B)
        if a2 == 0:
            results.append((h, xn, xd, yn, yd, b2))
            print(f"  kernel -> codomain j=0, b'' = {hex(b2)}")
    assert results, "no kernel lands on j=0 — iso-curve constants wrong?"
    return results


def derive_g2():
    """G2: degree-3 isogeny over Fp2. Kernel poly x - x0 with x0 a
    root in Fp2 of psi_3 = 3x^4 + 6A'x^2 + 12B'x - A'^2."""
    F2 = _Fp2()
    A, B = G2_A, G2_B
    psi3 = [F2.neg(F2.mul(A, A)), F2.scale(B, 12), F2.scale(A, 6),
            F2.zero, F2.from_int(3)]
    roots = _fp2_quartic_roots(F2, psi3)
    print(f"  psi3 roots in Fp2: {len(roots)}")
    results = []
    for x0 in roots:
        xn, xd, yn, yd, a2, b2 = _velu_deg1_fp2(F2, x0, A, B)
        if F2.is_zero(a2):
            results.append((x0, xn, xd, yn, yd, b2))
            print(f"  kernel x0={x0} -> j=0, b''={b2}")
    assert results, "no G2 kernel lands on j=0"
    return results


class _Fp2:
    """Fp[i]/(i^2+1) as pairs."""
    zero = (0, 0)

    def from_int(self, k):
        return (k % P, 0)

    def add(self, a, b):
        return ((a[0] + b[0]) % P, (a[1] + b[1]) % P)

    def sub(self, a, b):
        return ((a[0] - b[0]) % P, (a[1] - b[1]) % P)

    def neg(self, a):
        return ((-a[0]) % P, (-a[1]) % P)

    def mul(self, a, b):
        return ((a[0] * b[0] - a[1] * b[1]) % P,
                (a[0] * b[1] + a[1] * b[0]) % P)

    def scale(self, a, k):
        return (a[0] * k % P, a[1] * k % P)

    def inv(self, a):
        d = pow(a[0] * a[0] + a[1] * a[1], -1, P)
        return (a[0] * d % P, (-a[1]) * d % P)

    def is_zero(self, a):
        return a == (0, 0)

    def sqrt(self, a):
        """sqrt in Fp2 (p % 4 == 3): candidate a^((p^2+7)/8)-style —
        use the norm trick: for a = x+yi, |a| = sqrt(N(a)) in Fp."""
        if self.is_zero(a):
            return self.zero
        x, y = a
        if y == 0:
            s = _sqrt_fp(x)
            if s is not None:
                return (s, 0)
            s = _sqrt_fp((-x) % P)
            assert s is not None
            return (0, s)
        n = (x * x + y * y) % P
        sn = _sqrt_fp(n)
        if sn is None:
            return None
        for sgn in (sn, (-sn) % P):
            c2 = (x + sgn) * pow(2, -1, P) % P
            c = _sqrt_fp(c2)
            if c is not None:
                if c == 0:
                    continue
                d = y * pow(2 * c, -1, P) % P
                if self.mul((c, d), (c, d)) == a:
                    return (c, d)
        return None


def _sqrt_fp(a):
    if a == 0:
        return 0
    if pow(a, (P - 1) // 2, P) != 1:
        return None
    return pow(a, (P + 1) // 4, P)   # p % 4 == 3


def _fp2_quartic_roots(F2, f):
    """Roots in Fp2 of quartic f (coeff list of Fp2 pairs): solve by
    gcd(x^(p^2) - x, f) then brute-force the (small-degree) split via
    repeated random-shift gcds (CZ over Fp2)."""
    # polynomial helpers over Fp2
    def norm(g):
        while g and F2.is_zero(g[-1]):
            g.pop()
        return g

    def mul(f_, g_):
        out = [F2.zero] * (len(f_) + len(g_) - 1)
        for i, a in enumerate(f_):
            if not F2.is_zero(a):
                for j, b in enumerate(g_):
                    out[i + j] = F2.add(out[i + j], F2.mul(a, b))
        return norm(out)

    def mod(f_, g_):
        f_ = list(f_)
        dg = len(g_) - 1
        lg = F2.inv(g_[-1])
        while len(f_) - 1 >= dg and f_:
            c = F2.mul(f_[-1], lg)
            s = len(f_) - 1 - dg
            for i in range(dg + 1):
                f_[s + i] = F2.sub(f_[s + i], F2.mul(c, g_[i]))
            norm(f_)
        return f_

    def gcd(f_, g_):
        while g_:
            f_, g_ = g_, mod(f_, g_)
        if f_:
            li = F2.inv(f_[-1])
            f_ = [F2.mul(c, li) for c in f_]
        return f_

    def sub(f_, g_):
        n = max(len(f_), len(g_))
        return norm([F2.sub(f_[i] if i < len(f_) else F2.zero,
                            g_[i] if i < len(g_) else F2.zero)
                     for i in range(n)])

    def powmod(base, e, m):
        r = [F2.from_int(1)]
        base = mod(list(base), m)
        while e:
            if e & 1:
                r = mod(mul(r, base), m)
            base = mod(mul(base, base), m)
            e >>= 1
        return r

    x = [F2.zero, F2.from_int(1)]
    xq = powmod(x, P * P, f)
    lin = gcd(sub(xq, x), f)          # product of Fp2-rational roots
    # split lin (degree <= 4) by random shifts: gcd((x+r)^((q-1)/2)-1,g)
    roots = []
    rng = random.Random(5)
    stack = [lin]
    while stack:
        g = stack.pop()
        if len(g) - 1 <= 0:
            continue
        if len(g) - 1 == 1:
            roots.append(F2.neg(g[0]))
            continue
        while True:
            r = (rng.randrange(P), rng.randrange(P))
            e = (P * P - 1) // 2
            b = powmod([r, F2.from_int(1)], e, g)
            c = gcd(sub(b, [F2.from_int(1)]), g)
            if c and 0 < len(c) - 1 < len(g) - 1:
                # g / c
                q_, rem = _fp2_divmod(F2, g, c)
                assert not rem
                stack += [c, q_]
                break
    return roots


def _fp2_divmod(F2, f, g):
    f = list(f)
    dg = len(g) - 1
    lg = F2.inv(g[-1])
    q = [F2.zero] * max(len(f) - dg, 0)
    while len(f) - 1 >= dg and f:
        c = F2.mul(f[-1], lg)
        s = len(f) - 1 - dg
        q[s] = c
        for i in range(dg + 1):
            f[s + i] = F2.sub(f[s + i], F2.mul(c, g[i]))
        while f and F2.is_zero(f[-1]):
            f.pop()
    while q and F2.is_zero(q[-1]):
        q.pop()
    return q, f


def _velu_deg1_fp2(F2, x0, A, B):
    """Degree-3 normalized isogeny with kernel x - x0 over Fp2."""
    # v = 6 x0^2 + 2A ; u = 4(x0^3 + A x0 + B)
    x2 = F2.mul(x0, x0)
    v = F2.add(F2.scale(x2, 6), F2.scale(A, 2))
    u = F2.scale(F2.add(F2.mul(x2, x0),
                        F2.add(F2.mul(A, x0), B)), 4)
    # x_map = x + v/(x-x0) + u/(x-x0)^2
    #       = [ (x)(x-x0)^2 + v(x-x0) + u ] / (x-x0)^2
    one = F2.from_int(1)
    h = [F2.neg(x0), one]
    h2 = [F2.mul(x0, x0), F2.neg(F2.scale(x0, 2)), one]
    xn = [F2.zero] + h2                       # x * h2
    xn = _p2add(F2, xn, [F2.add(F2.mul(v, F2.neg(x0)), u), v])
    # y_map = y * d(xn/h2)/dx = y*(xn' h - 2 xn h')/h^3, h' = 1
    xnp = _p2diff(F2, xn)
    yn = _p2sub(F2, _p2mul(F2, xnp, h), [F2.scale(c, 2) for c in xn])
    yd = _p2mul(F2, h2, h)
    t = v
    w = F2.add(u, F2.mul(x0, v))
    a2 = F2.sub(A, F2.scale(t, 5))
    b2 = F2.sub(B, F2.scale(w, 7))
    return xn, h2, yn, yd, a2, b2


def _p2add(F2, f, g):
    n = max(len(f), len(g))
    out = [F2.add(f[i] if i < len(f) else F2.zero,
                  g[i] if i < len(g) else F2.zero) for i in range(n)]
    while out and F2.is_zero(out[-1]):
        out.pop()
    return out


def _p2sub(F2, f, g):
    return _p2add(F2, f, [F2.neg(c) for c in g])


def _p2mul(F2, f, g):
    out = [F2.zero] * (len(f) + len(g) - 1)
    for i, a in enumerate(f):
        for j, b in enumerate(g):
            out[i + j] = F2.add(out[i + j], F2.mul(a, b))
    while out and F2.is_zero(out[-1]):
        out.pop()
    return out


def _p2diff(F2, f):
    return [F2.scale(f[i], i) for i in range(1, len(f))]


if __name__ == "__main__":
    print("=== G1 (degree-11) ===")
    g1 = derive_g1()
    print("=== G2 (degree-3) ===")
    g2 = derive_g2()
    import pickle
    with open("/tmp/sswu_raw.pkl", "wb") as fh:
        pickle.dump({"g1": g1, "g2": g2}, fh)
    print("raw results -> /tmp/sswu_raw.pkl")
