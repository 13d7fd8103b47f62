"""Stage 2 of the SSWU derivation: pin the automorphism ambiguity.

The Velu derivation (tools/derive_sswu.py) determines the degree-11
(G1) / degree-3 (G2) isogeny up to composition with an automorphism of
the target curve (j = 0 -> 6 automorphisms: (x,y) -> (w^2 x, w^3 y),
w^6 = 1). Each choice of c with c^6 = b_target / b_velu gives one
composed candidate map. This script runs the FULL RFC 9380 RO suite
(expand_message_xmd -> hash_to_field -> SSWU -> isogeny -> clear
cofactor) for every candidate and prints the resulting point for the
standard test messages, so the RFC 9380 J.9.1/J.10.1 vectors select
the right candidate. It then writes gnark_tpu/ec/sswu_data.py.

Usage:  python tools/pin_sswu.py          # print candidates
        python tools/pin_sswu.py g1=N g2=M  # write sswu_data.py
"""

from __future__ import annotations

import pickle
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from derive_sswu import P, _prime_root, _Fp2, _fp2_quartic_roots  # noqa: E402
from gnark_tpu.ec import hash_to_curve as h2c  # noqa: E402

DST_G1 = b"QUUX-V01-CS02-with-BLS12381G1_XMD:SHA-256_SSWU_RO_"
DST_G2 = b"QUUX-V01-CS02-with-BLS12381G2_XMD:SHA-256_SSWU_RO_"


def sixth_roots_fp(t):
    """All 6 sixth-roots of t in Fp (zeta_6 in Fp since 3 | p-1)."""
    c = _prime_root(_prime_root(t, 2, P), 3, P)
    # zeta_6 = -zeta_3^2 ... enumerate via a primitive 6th root
    z3 = _prime_root(1, 3, P)
    # find a PRIMITIVE cube root of unity
    g = pow(5, (P - 1) // 3, P)
    assert g != 1
    z6 = (-g) % P  # (-z3)^6 = z3^6=1; order: (-g) has order 6 iff g!=1
    roots = set()
    cur = c
    for _ in range(6):
        cur = cur * z6 % P
        if pow(cur, 6, P) == t % P:
            roots.add(cur)
    assert len(roots) == 6, roots
    return sorted(roots)


def sixth_roots_fp2(t):
    """All 6 sixth-roots of t in Fp2 via polynomial root-finding."""
    F2 = _Fp2()
    f = [F2.neg(t), F2.zero, F2.zero, F2.zero, F2.zero, F2.zero,
         F2.from_int(1)]
    roots = _fp2_quartic_roots(F2, f)      # generic root finder
    out = []
    for r in roots:
        c = r
        p6 = c
        for _ in range(5):
            p6 = F2.mul(p6, c)
        if p6 == (t[0] % P, t[1] % P):
            out.append(c)
    return sorted(out)


def compose_g1(cand, c):
    """Scale the Velu maps by the isomorphism (x,y)->(c^2 x, c^3 y)."""
    h, xn, xd, yn, yd, b2 = cand
    c2, c3 = c * c % P, c * c % P * c % P
    return ([v * c2 % P for v in xn], list(xd),
            [v * c3 % P for v in yn], list(yd))


def compose_g2(cand, c):
    F2 = _Fp2()
    x0, xn, xd, yn, yd, b2 = cand
    c2 = F2.mul(c, c)
    c3 = F2.mul(c2, c)
    return ([F2.mul(v, c2) for v in xn], list(xd),
            [F2.mul(v, c3) for v in yn], list(yd))


def run_g1(iso, msg):
    u = h2c.hash_to_field(msg, DST_G1, 2)
    q0 = h2c.eval_iso_fp(h2c._sswu_fp(u[0], h2c.G1_A, h2c.G1_B,
                                      h2c.G1_Z), *iso)
    q1 = h2c.eval_iso_fp(h2c._sswu_fp(u[1], h2c.G1_A, h2c.G1_B,
                                      h2c.G1_Z), *iso)
    return h2c.clear_cofactor_g1(h2c._ec_add_fp(q0, q1))


def run_g2(iso, msg):
    u = h2c.hash_to_field(msg, DST_G2, 2, m=2)
    q0 = h2c.eval_iso_fp2(h2c._sswu_fp2(u[0], h2c.G2_A, h2c.G2_B,
                                        h2c.G2_Z), *iso)
    q1 = h2c.eval_iso_fp2(h2c._sswu_fp2(u[1], h2c.G2_A, h2c.G2_B,
                                        h2c.G2_Z), *iso)
    return h2c.clear_cofactor_g2(h2c._ec_add_fp2(q0, q1))


def sanity(iso_g1, iso_g2):
    """Structural checks independent of the RFC pinning: the composed
    map sends E1' points to E, is compatible with addition, and the
    cleared points are r-torsion."""
    import random
    rng = random.Random(11)
    for _ in range(3):
        while True:
            x = rng.randrange(P)
            rhs = (pow(x, 3, P) + h2c.G1_A * x + h2c.G1_B) % P
            y = h2c._sqrt_fp(rhs)
            if y is not None:
                break
        X, Y = h2c.eval_iso_fp((x, y), *iso_g1)
        assert (Y * Y - pow(X, 3, P) - 4) % P == 0, "not on E!"
    pt = run_g1(iso_g1, b"sanity")
    assert h2c._ec_mul_fp(pt, h2c.R_ORDER) is None, "not in G1!"
    pt2 = run_g2(iso_g2, b"sanity")
    assert h2c._ec_mul_fp2(pt2, h2c.R_ORDER) is None, "not in G2!"
    print("sanity: iso lands on E, cleared points are r-torsion  OK")


def main():
    with open("/tmp/sswu_raw.pkl", "rb") as fh:
        raw = pickle.load(fh)
    F2 = _Fp2()

    g1_variants = []
    for cand in raw["g1"]:
        b2 = cand[5]
        for c in sixth_roots_fp(4 * pow(b2, -1, P) % P):
            g1_variants.append((cand, c, compose_g1(cand, c)))
    g2_variants = []
    for cand in raw["g2"]:
        b2 = cand[5]
        t = F2.mul((4, 4), F2.inv(b2))
        for c in sixth_roots_fp2(t):
            g2_variants.append((cand, c, compose_g2(cand, c)))

    print(f"G1: {len(g1_variants)} candidates")
    for i, (cand, c, iso) in enumerate(g1_variants):
        px_empty = run_g1(iso, b"")[0]
        px_abc = run_g1(iso, b"abc")[0]
        print(f"  [{i}] c={hex(c)[:16]} xnum0={hex(iso[0][0])[:12]} "
              f"P('').x={hex(px_empty)} P(abc).x={hex(px_abc)[:20]}")
    print(f"G2: {len(g2_variants)} candidates")
    for i, (cand, c, iso) in enumerate(g2_variants):
        px = run_g2(iso, b"")[0]
        print(f"  [{i}] xnum0={tuple(hex(v)[:12] for v in iso[0][0])} "
              f"P('').x=({hex(px[0])}, {hex(px[1])[:20]})")

    sel = {k: int(v) for k, v in
           (a.split("=") for a in sys.argv[1:] if "=" in a)}
    if "g1" not in sel or "g2" not in sel:
        print("\nrun again with g1=N g2=M to write sswu_data.py")
        return
    _, c1, iso1 = g1_variants[sel["g1"]]
    _, c2, iso2 = g2_variants[sel["g2"]]
    sanity(iso1, iso2)
    with open("/root/repo/gnark_tpu/ec/sswu_data.py", "w") as fh:
        fh.write('"""SSWU isogeny tables for BLS12-381 '
                 '(DERIVED, not copied).\n\n'
                 "Generated by tools/derive_sswu.py + tools/pin_sswu.py:\n"
                 "the 11-isogeny (G1) / 3-isogeny (G2) rational maps\n"
                 "from the published SSWU iso-curves to E/E2, computed\n"
                 "via division-polynomial kernel extraction + Velu, and\n"
                 "pinned among the 6 automorphism composites against the\n"
                 "RFC 9380 J.9.1/J.10.1 test vectors (see tests).\n"
                 '"""\n\n')
        fh.write(f"G1_XNUM = {iso1[0]!r}\n")
        fh.write(f"G1_XDEN = {iso1[1]!r}\n")
        fh.write(f"G1_YNUM = {iso1[2]!r}\n")
        fh.write(f"G1_YDEN = {iso1[3]!r}\n\n")
        fh.write(f"G2_XNUM = {iso2[0]!r}\n")
        fh.write(f"G2_XDEN = {iso2[1]!r}\n")
        fh.write(f"G2_YNUM = {iso2[2]!r}\n")
        fh.write(f"G2_YDEN = {iso2[3]!r}\n")
    print("wrote gnark_tpu/ec/sswu_data.py")


if __name__ == "__main__":
    main()
