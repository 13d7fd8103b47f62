"""Differential tests: device EC kernels vs the host (Python-int) oracle."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from gnark_tpu.ec import curves, host
from gnark_tpu.ec.fp2 import get_ff2
from gnark_tpu.ec.weierstrass import (
    affine_to_jacobian, jac_add, jac_add_mixed, jac_double, jac_inf,
    jac_to_affine, scalar_mul_bits,
)
from gnark_tpu.ff import get_ff

RNG = random.Random(7)


def host_points(curve, n, include_special=True):
    """Random affine host points (as multiples of g1), plus edge cases."""
    f = curve.host_fp
    pts = [host.ec_mul(f, curve.g1, RNG.randrange(1, curve.fr.modulus))
           for _ in range(n)]
    if include_special:
        pts[0] = host.INF
        if n > 2:
            pts[1] = curve.g1
            pts[2] = host.ec_neg(f, curve.g1)
    return pts


def encode_affine(ff, pts):
    """Host affine points -> device (x, y, inf) arrays."""
    xs = [p[0] if p is not host.INF else 0 for p in pts]
    ys = [p[1] if p is not host.INF else 0 for p in pts]
    inf = jnp.asarray(np.array([p is host.INF for p in pts]))
    return (jnp.asarray(ff.encode(xs)), jnp.asarray(ff.encode(ys)), inf)


def decode_affine(ff, A):
    x, y, inf = A
    xs = ff.decode(np.asarray(x))
    ys = ff.decode(np.asarray(y))
    infs = np.asarray(inf)
    return [host.INF if infs[i] else (int(xs[i]), int(ys[i]))
            for i in range(len(infs))]


@pytest.mark.parametrize("name", ["bn254", "grumpkin", "bw6_761"])
def test_g1_add_double_mixed(name):
    curve = curves.CURVES[name]
    ff = get_ff(curve.fp.name)
    f_host = curve.host_fp
    n = 8
    P = host_points(curve, n)
    Q = host_points(curve, n)
    Q[3] = P[3]                      # equal points -> doubling path
    Q[4] = host.ec_neg(f_host, P[4])  # opposite points -> infinity path

    dP = affine_to_jacobian(ff, encode_affine(ff, P))
    dQaff = encode_affine(ff, Q)
    dQ = affine_to_jacobian(ff, dQaff)

    got_add = decode_affine(ff, jac_to_affine(ff, jac_add(ff, dP, dQ)))
    got_mix = decode_affine(ff, jac_to_affine(ff, jac_add_mixed(ff, dP, dQaff)))
    got_dbl = decode_affine(ff, jac_to_affine(ff, jac_double(ff, dP)))
    for i in range(n):
        want = host.ec_add(f_host, P[i], Q[i])
        assert got_add[i] == want, f"add[{i}]"
        assert got_mix[i] == want, f"mixed[{i}]"
        assert got_dbl[i] == host.ec_dbl(f_host, P[i]), f"dbl[{i}]"


def test_g1_scalar_mul():
    curve = curves.CURVES["bn254"]
    ff = get_ff(curve.fp.name)
    k = RNG.randrange(1, curve.fr.modulus)
    bits = [(k >> i) & 1 for i in range(k.bit_length() - 1, -1, -1)]
    dG = affine_to_jacobian(ff, encode_affine(ff, [curve.g1]))
    got = decode_affine(ff, jac_to_affine(ff, scalar_mul_bits(ff, dG, bits)))
    assert got[0] == host.ec_mul(curve.host_fp, curve.g1, k)


@pytest.mark.parametrize("name", ["bn254", "bls12_377"])
def test_fp2_arith(name):
    curve = curves.CURVES[name]
    f2h = curve.host_g2_field
    ff2 = get_ff2(curve.fp.name, curve.fp2_nr)
    n = 16
    a = [f2h.rand(RNG) for _ in range(n)]
    b = [f2h.rand(RNG) for _ in range(n)]
    da, db = jnp.asarray(ff2.encode(a)), jnp.asarray(ff2.encode(b))

    for opn, dev, ref in [
        ("add", ff2.add, f2h.add), ("sub", ff2.sub, f2h.sub),
        ("mul", ff2.mul, f2h.mul),
    ]:
        got = ff2.decode(np.asarray(dev(da, db)))
        for i in range(n):
            w = ref(a[i], b[i])
            assert (int(got[i][0]), int(got[i][1])) == w, f"{opn}[{i}]"
    got = ff2.decode(np.asarray(ff2.square(da)))
    for i in range(n):
        w = f2h.sqr(a[i])
        assert (int(got[i][0]), int(got[i][1])) == w
    got = ff2.decode(np.asarray(ff2.inv(da)))
    for i in range(n):
        w = f2h.inv(a[i])
        assert (int(got[i][0]), int(got[i][1])) == w


@pytest.mark.slow
def test_g2_group_ops_bn254():
    curve = curves.CURVES["bn254"]
    f2h = curve.host_g2_field
    ff2 = get_ff2(curve.fp.name, curve.fp2_nr)
    g2 = curve.g2
    P = [host.ec_mul(f2h, g2, RNG.randrange(1, curve.fr.modulus))
         for _ in range(4)] + [host.INF]
    Q = [host.ec_mul(f2h, g2, RNG.randrange(1, curve.fr.modulus))
         for _ in range(4)] + [g2]
    Q[1] = P[1]

    def enc(pts):
        xs = [p[0] if p is not host.INF else (0, 0) for p in pts]
        ys = [p[1] if p is not host.INF else (0, 0) for p in pts]
        inf = jnp.asarray(np.array([p is host.INF for p in pts]))
        return (jnp.asarray(ff2.encode(xs)), jnp.asarray(ff2.encode(ys)), inf)

    dP = affine_to_jacobian(ff2, enc(P))
    dQ = affine_to_jacobian(ff2, enc(Q))
    x, y, inf = jac_to_affine(ff2, jac_add(ff2, dP, dQ))
    xs, ys, infs = ff2.decode(np.asarray(x)), ff2.decode(np.asarray(y)), np.asarray(inf)
    for i in range(len(P)):
        want = host.ec_add(f2h, P[i], Q[i])
        if want is host.INF:
            assert infs[i]
        else:
            got = ((int(xs[i][0]), int(xs[i][1])), (int(ys[i][0]), int(ys[i][1])))
            assert got == want, f"g2 add[{i}]"


def test_jac_inf_identity():
    curve = curves.CURVES["bn254"]
    ff = get_ff(curve.fp.name)
    Z = jac_inf(ff, (3,))
    R = jac_add(ff, Z, Z)
    assert bool(jnp.all(ff.is_zero(R[2])))
