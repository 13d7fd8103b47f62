"""One-time derivation + validation of curve constants.

Generates gnark_tpu/ec/curves_data.py (committed, then re-validated by
tests/test_ec.py). For each curve we:

  1. re-derive p, r, t (Frobenius trace) from the curve-family seed and
     assert they match the pinned field moduli (catches typos),
  2. compute group orders / cofactors for G1 and the G2 twist from the
     trace (sextic-twist order candidates filtered by r-divisibility and
     checked probabilistically with random points),
  3. validate well-known generator coordinates (on-curve + order-r); if
     a constant is not pinned here, derive a deterministic generator
     (smallest valid x, lexicographically smaller y, cofactor-cleared).

Usage: python tools/derive_curve_constants.py
"""

from __future__ import annotations

import math
import random
import sys

sys.path.insert(0, ".")

from gnark_tpu.ec.host import (  # noqa: E402
    INF, Fp, Fp2, ec_mul, ec_on_curve, find_point,
)
from gnark_tpu import fields  # noqa: E402

RNG = random.Random(0xC0FFEE)


def isqrt_exact(n: int):
    r = math.isqrt(n)
    return r if r * r == n else None


def rand_point(f, b):
    while True:
        x = f.rand(RNG)
        rhs = f.add(f.mul(f.sqr(x), x), b)
        y = f.sqrt(rhs)
        if y is not None:
            return (x, y)


def check_order(f, b, n: int, trials: int = 3) -> bool:
    """Probabilistic check that #E = n: n*P == INF for random P."""
    for _ in range(trials):
        if ec_mul(f, rand_point(f, b), n) is not INF:
            return False
    return True


def find_curve_order(f, b, p: int, r: int, t_hint=None):
    """Find #E(F) = p + 1 - t with r | #E, |t| <= 2*sqrt(p)."""
    lim = 2 * math.isqrt(p) + 2
    cands = []
    if t_hint is not None:
        cands.append(t_hint)
    # all t == (p+1) mod r within Hasse bound
    t0 = (p + 1) % r
    k = -(lim + t0) // r
    while t0 + k * r <= lim:
        t = t0 + k * r
        if abs(t) <= lim:
            cands.append(t)
        k += 1
    for t in cands:
        n = p + 1 - t
        if n % r == 0 and check_order(f, b, n):
            return n, t
    raise RuntimeError("no curve order found")


def twist_order_candidates(p_ext: int, t_ext: int):
    """Order candidates for (sextic/cubic/quadratic) twists of a j=0 curve
    over a field of size p_ext, given the trace t_ext of E itself."""
    cands = {p_ext + 1 + t_ext}  # quadratic twist
    d = 4 * p_ext - t_ext * t_ext
    if d % 3 == 0:
        f = isqrt_exact(d // 3)
        if f is not None:
            for s1 in (1, -1):
                for s2 in (1, -1):
                    tt = (s1 * t_ext + s2 * 3 * f)
                    if tt % 2 == 0:
                        cands.add(p_ext + 1 - tt // 2)
            cands.add(p_ext + 1 - (-t_ext))
    return sorted(cands)


def find_twist(f, b_cands, p_ext, t_ext, r):
    for b in b_cands:
        for n in twist_order_candidates(p_ext, t_ext):
            if n % r == 0 and check_order(f, b, n):
                return b, n
    raise RuntimeError("no valid twist found")


def pick_generator(f, b, cofactor: int, r: int, preferred=None, label=""):
    if preferred is not None:
        if ec_on_curve(f, b, preferred) and ec_mul(f, preferred, r) is INF \
                and preferred is not INF:
            print(f"  {label}: pinned generator VALID")
            return preferred
        print(f"  {label}: pinned generator INVALID -> deriving")
    x = 0
    while True:
        P = find_point(f, b, x)
        G = ec_mul(f, P, cofactor)
        if G is not INF and ec_mul(f, G, r) is INF:
            print(f"  {label}: derived generator at x={P[0]}")
            return G
        x = (P[0] if isinstance(P[0], int) else P[0][0]) + 1


# ---------------------------------------------------------------------------

def bn254():
    z = 4965661367192848881
    p = 36 * z**4 + 36 * z**3 + 24 * z**2 + 6 * z + 1
    r = 36 * z**4 + 36 * z**3 + 18 * z**2 + 6 * z + 1
    t = 6 * z**2 + 1
    assert p == fields.BN254_FP.modulus and r == fields.BN254_FR.modulus
    assert p + 1 - t == r
    f1 = Fp(p)
    b = 3
    g1 = pick_generator(f1, b, 1, r, preferred=(1, 2), label="bn254 g1")

    nr = -1
    f2 = Fp2(f1, nr)
    xi = (9, 1)
    t2 = t * t - 2 * p
    b2_cands = [f2.mul(f2.from_int(3), f2.inv(xi)), f2.mul(f2.from_int(3), xi)]
    b2, n2 = find_twist(f2, b2_cands, p * p, t2, r)
    h2 = n2 // r
    g2_pref = (
        (10857046999023057135944570762232829481370756359578518086990519993285655852781,
         11559732032986387107991004021392285783925812861821192530917403151452391805634),
        (8495653923123431417604973247489272438418190587263600148770280649306958101930,
         4082367875863433681332203403145435568316851327593401208105741076214120093531),
    )
    g2 = pick_generator(f2, b2, h2, r, preferred=g2_pref, label="bn254 g2")
    return dict(name="bn254", seed=z, fp=p, fr=r, t=t, b=b, h1=1, g1=g1,
                fp2_nr=nr % p, xi=xi, b2=b2, h2=h2, g2=g2)


def bls12(name, u, pinned_fp, pinned_fr, b, nr, xi, g1_pref, g2_pref):
    r = u**4 - u**2 + 1
    p = (u - 1) ** 2 * r // 3 + u
    t = u + 1
    assert p == pinned_fp and r == pinned_fr, name
    f1 = Fp(p)
    h1 = (p + 1 - t) // r
    assert (p + 1 - t) % r == 0 and check_order(f1, b, p + 1 - t)
    g1 = pick_generator(f1, b, h1, r, preferred=g1_pref, label=f"{name} g1")

    f2 = Fp2(f1, nr)
    t2 = t * t - 2 * p
    b_f2 = f2.from_int(b)
    b2_cands = [f2.mul(b_f2, f2.inv(xi)), f2.mul(b_f2, xi)]
    b2, n2 = find_twist(f2, b2_cands, p * p, t2, r)
    h2 = n2 // r
    g2 = pick_generator(f2, b2, h2, r, preferred=g2_pref, label=f"{name} g2")
    return dict(name=name, seed=u, fp=p, fr=r, t=t, b=b, h1=h1, g1=g1,
                fp2_nr=nr % p, xi=xi, b2=b2, h2=h2, g2=g2)


def bw6_761():
    p = fields.BW6_761_FP.modulus
    r = fields.BW6_761_FR.modulus  # == BLS12-377 p
    f1 = Fp(p)
    b = p - 1  # y^2 = x^3 - 1
    n1, t = find_curve_order(f1, b, p, r)
    h1 = n1 // r
    g1 = pick_generator(f1, b, h1, r, label="bw6_761 g1")
    # G2 is a sextic twist also over Fp (embedding degree 6): y^2 = x^3 + b'
    b2_cands = [4, p - 4, 2, p - 2, 3, p - 3, 7]
    b2, n2 = find_twist(f1, b2_cands, p, t, r)
    h2 = n2 // r
    g2 = pick_generator(f1, b2, h2, r, label="bw6_761 g2")
    return dict(name="bw6_761", seed=None, fp=p, fr=r, t=t, b=b, h1=h1, g1=g1,
                fp2_nr=None, xi=None, b2=b2, h2=h2, g2=g2)


def grumpkin():
    # 2-cycle partner of bn254: base field = bn254 fr, order = bn254 fp
    p = fields.GRUMPKIN_FR.modulus  # this is the *scalar* field = bn254 fp
    q = fields.BN254_FR.modulus     # base field
    f1 = Fp(q)
    b = q - 17
    assert check_order(f1, b, p), "grumpkin order != bn254 fp"
    t = q + 1 - p
    g1 = pick_generator(f1, b, 1, p,
                        preferred=(1, f1.sqrt(f1.from_int(-16))),
                        label="grumpkin g1")
    return dict(name="grumpkin", seed=None, fp=q, fr=p, t=t, b=b, h1=1, g1=g1,
                fp2_nr=None, xi=None, b2=None, h2=None, g2=None)


def main():
    curves = [
        bn254(),
        bls12(
            "bls12_381", -0xD201000000010000,
            fields.BLS12_381_FP.modulus, fields.BLS12_381_FR.modulus,
            4, -1, (1, 1),
            g1_pref=(
                3685416753713387016781088315183077757961620795782546409894578378688607592378376318836054947676345821548104185464507,
                1339506544944476473020471379941921221584933875938349620426543736416511423956333506472724655353366534992391756441569,
            ),
            g2_pref=(
                (352701069587466618187139116011060144890029952792775240219908644239793785735715026873347600343865175952761926303160,
                 3059144344244213709971259814753781636986470325476647558659373206291635324768958432433509563104347017837885763365758),
                (1985150602287291935568054521177171638300868978215655730859378665066344726373823718423869104263333984641494340347905,
                 927553665492332455747201965776037880757740193453592970025027978793976877002675564980949289727957565575433344219582),
            ),
        ),
        bls12(
            "bls12_377", 0x8508C00000000001,
            fields.BLS12_377_FP.modulus, fields.BLS12_377_FR.modulus,
            1, -5, (0, 1),
            g1_pref=(
                81937999373150964239938255573465948239988671502647976594219695644855304257327692006745978603320413799295628339695,
                241266749859715473739788878240585681733927191168601896383759122102112907357779751001206799952863815012735208165030,
            ),
            g2_pref=(
                (233578398248691099356572568220835526895379068987715365179118596935057653620464273615301663571204657964920925606294,
                 140913150380207355837477652521042157274541796891053068589147167627541651775299824604154852141315666357241556069118),
                (63160294768292073209381361943935198908131692476676907196754037919244929611450776219210369229519898517858833747423,
                 149157405641012693445398062341192467754805999074082136895788947234480009303640899064710353187729182149407503257491),
            ),
        ),
        bw6_761(),
        grumpkin(),
    ]
    with open("gnark_tpu/ec/curves_data.py", "w") as fh:
        fh.write('"""GENERATED by tools/derive_curve_constants.py — do not edit.\n\n'
                 "Derived + validated curve constants (orders/cofactors from\n"
                 "trace search; generators on-curve- and order-checked).\n"
                 '"""\n\nCURVES_DATA = {\n')
        for c in curves:
            fh.write(f'    "{c["name"]}": {c!r},\n')
        fh.write("}\n")
    print("wrote gnark_tpu/ec/curves_data.py")


if __name__ == "__main__":
    main()
