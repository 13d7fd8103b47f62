"""MSM differential tests vs the naive host oracle."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from gnark_tpu.ec import curves, host
from gnark_tpu.ec.fp2 import get_ff2
from gnark_tpu.ec.weierstrass import jac_to_affine
from gnark_tpu.ff import get_ff
from gnark_tpu.msm import msm

RNG = random.Random(99)


def scalar_limbs(ff, ks):
    """Plain (non-Montgomery) scalar limb array from python ints."""
    return jnp.asarray(ff.encode(ks, mont=False))


@pytest.mark.parametrize("n,c,g", [(1, None, None), (7, 4, 2), (64, 8, 4),
                                   (200, 8, 8)])
def test_msm_g1_bn254(n, c, g):
    curve = curves.CURVES["bn254"]
    ffp = get_ff(curve.fp.name)
    ffr = get_ff(curve.fr.name)
    fh = curve.host_fp
    pts = [host.ec_mul(fh, curve.g1, RNG.randrange(1, curve.fr.modulus))
           for _ in range(n)]
    ks = [RNG.randrange(0, curve.fr.modulus) for _ in range(n)]
    if n > 2:
        pts[1] = host.INF     # infinity input point
        ks[2] = 0             # zero scalar
    if n > 5:
        pts[4] = pts[5]       # duplicate points (bucket doubling path)
        ks[4] = ks[5]

    x = jnp.asarray(ffp.encode([p[0] if p is not host.INF else 0 for p in pts]))
    y = jnp.asarray(ffp.encode([p[1] if p is not host.INF else 0 for p in pts]))
    inf = jnp.asarray(np.array([p is host.INF for p in pts]))

    R = msm(ffp, (x, y, inf), scalar_limbs(ffr, ks), curve.fr.bits, c=c,
            groups=g)
    rx, ry, rinf = jac_to_affine(ffp, R)
    want = host.ec_msm(fh, pts, ks)
    if want is host.INF:
        assert bool(rinf)
    else:
        assert (int(ffp.decode(np.asarray(rx))),
                int(ffp.decode(np.asarray(ry)))) == want


@pytest.mark.slow
def test_msm_g2_bn254():
    curve = curves.CURVES["bn254"]
    ff2 = get_ff2(curve.fp.name, curve.fp2_nr)
    ffr = get_ff(curve.fr.name)
    f2h = curve.host_g2_field
    n = 17
    pts = [host.ec_mul(f2h, curve.g2, RNG.randrange(1, curve.fr.modulus))
           for _ in range(n)]
    ks = [RNG.randrange(0, curve.fr.modulus) for _ in range(n)]

    x = jnp.asarray(ff2.encode([p[0] for p in pts]))
    y = jnp.asarray(ff2.encode([p[1] for p in pts]))
    inf = jnp.zeros((n,), bool)

    R = msm(ff2, (x, y, inf), scalar_limbs(ffr, ks), curve.fr.bits, c=6,
            groups=4)
    rx, ry, rinf = jac_to_affine(ff2, R)
    want = host.ec_msm(f2h, pts, ks)
    gx, gy = ff2.decode(np.asarray(rx)), ff2.decode(np.asarray(ry))
    assert ((int(gx[0]), int(gx[1])), (int(gy[0]), int(gy[1]))) == want


@pytest.mark.slow
def test_msm_bucket_chunked_matches():
    """Chunked streaming == single-shot bucket MSM (tiny chunks)."""
    from gnark_tpu.msm.bucket_kernel import msm_bucket, msm_bucket_chunked
    curve = curves.CURVES["bn254"]
    ffp_ = get_ff(curve.fp.name)
    ffr_ = get_ff(curve.fr.name)
    n = 96
    f1 = curve.host_fp
    pts, cur = [], curve.g1
    for _ in range(n):
        pts.append(cur)
        cur = host.ec_add(f1, cur, curve.g1)
    x = jnp.asarray(ffp_.encode([p[0] for p in pts]))
    y = jnp.asarray(ffp_.encode([p[1] for p in pts]))
    inf = jnp.zeros((n,), bool)
    ks = [RNG.randrange(curve.fr.modulus) for _ in range(n)]
    scalars = scalar_limbs(ffr_, ks)
    nbits = curve.fr.bits
    whole = msm_bucket(ffp_, (x, y, inf), scalars, nbits)
    parts = msm_bucket_chunked(ffp_, (x, y, inf), scalars, nbits,
                               chunk=32)
    a = jac_to_affine(ffp_, tuple(v[None] for v in whole))
    b = jac_to_affine(ffp_, tuple(v[None] for v in parts))
    for u, v in zip(a, b):
        assert np.array_equal(np.asarray(u), np.asarray(v))
