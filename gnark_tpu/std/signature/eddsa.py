"""EdDSA over Baby Jubjub: host signer + in-circuit verifier.

Analog of the reference's std/signature/eddsa (verification gadget on
the per-curve twisted Edwards companion, MiMC as the challenge hash).

    keygen:  A = a*B
    sign:    r = H(nonce_key || msg) mod l ; R = r*B
             c = MiMC(R.x, R.y, A.x, A.y, msg)
             S = r + c*a mod l
    verify:  S*B == R + c*A        (checked in the prime subgroup)
"""

from __future__ import annotations

import hashlib

from gnark_tpu.std.algebra import twistededwards as te
from gnark_tpu.std.hash.mimc import MiMC, MiMCGadget


def keygen(seed: bytes):
    a = int.from_bytes(hashlib.sha512(b"key" + seed).digest(),
                       "big") % te.ORDER or 1
    A = te.scalar_mul(te.GEN, a)
    return a, A


def _challenge(R, A, msg: int) -> int:
    return MiMC("bn254_fr").write(R[0], R[1], A[0], A[1], msg).sum()


def sign(a: int, A, msg: int):
    r = int.from_bytes(
        hashlib.sha512(b"nonce" + a.to_bytes(32, "big")
                       + msg.to_bytes(32, "big")).digest(), "big") % te.ORDER
    R = te.scalar_mul(te.GEN, r)
    c = _challenge(R, A, msg)
    S = (r + c * a) % te.ORDER
    return (R, S)


def host_verify(A, msg: int, sig) -> bool:
    R, S = sig
    if not (te.on_curve(A) and te.on_curve(R)):
        return False
    c = _challenge(R, A, msg)
    lhs = te.scalar_mul(te.GEN, S % te.ORDER)
    rhs = te.add(R, te.scalar_mul(A, c % te.ORDER))
    return lhs == rhs


def verify_gadget(api, pub_key, msg, sig_r, sig_s) -> None:
    """In-circuit verification: pub_key = (Ax, Ay), sig_r = (Rx, Ry),
    sig_s a scalar variable (reference eddsa.Verify shape)."""
    ed = te.EdwardsGadget(api)
    Ax, Ay = pub_key
    Rx, Ry = sig_r
    ed.assert_on_curve(Ax, Ay)
    ed.assert_on_curve(Rx, Ry)

    g = MiMCGadget(api)
    g.write(Rx, Ry, Ax, Ay, msg)
    c = g.sum()

    # reject scalar malleability: S < subgroup order
    api.assert_is_less_or_equal(sig_s, te.ORDER - 1)
    lhs = ed.scalar_mul(te.GEN, sig_s)
    # c is a full field element: 254 bits
    cA = ed.scalar_mul((Ax, Ay), c, nbits=254)
    rhs = ed.add((Rx, Ry), cA)
    api.assert_is_equal(lhs[0], rhs[0])
    api.assert_is_equal(lhs[1], rhs[1])
