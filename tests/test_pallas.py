"""Pallas kernel tests (interpret mode on CPU).

GNARK_TPU_PALLAS is env-forced per test via subprocess-free config
reset (config caches are lru_cache'd — clear them around the flag)."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnark_tpu import config
from gnark_tpu.ec import curves, host
from gnark_tpu.ec.weierstrass import (
    affine_to_jacobian, jac_to_affine,
)
from gnark_tpu.ff import get_ff

RNG = random.Random(17)


@pytest.fixture
def pallas_on(monkeypatch):
    monkeypatch.setenv("GNARK_TPU_PALLAS", "1")
    config.use_pallas.cache_clear()
    yield
    config.use_pallas.cache_clear()


@pytest.fixture
def pallas_off(monkeypatch):
    monkeypatch.setenv("GNARK_TPU_PALLAS", "0")
    config.use_pallas.cache_clear()
    yield
    config.use_pallas.cache_clear()


def _setup(n):
    curve = curves.CURVES["bn254"]
    ffp = get_ff(curve.fp.name)
    ffr = get_ff(curve.fr.name)
    fh = curve.host_fp
    pts = [host.ec_mul(fh, curve.g1, RNG.randrange(1, curve.fr.modulus))
           for _ in range(n)]
    ks = [RNG.randrange(0, curve.fr.modulus) for _ in range(n)]
    if n > 5:
        pts[1] = host.INF
        ks[2] = 0
        pts[4] = pts[5]
        ks[4] = ks[5]
    x = jnp.asarray(ffp.encode([p[0] if p is not host.INF else 0 for p in pts]))
    y = jnp.asarray(ffp.encode([p[1] if p is not host.INF else 0 for p in pts]))
    inf = jnp.asarray(np.array([p is host.INF for p in pts]))
    sc = jnp.asarray(ffr.encode(ks, mont=False))
    return curve, ffp, fh, pts, ks, (x, y, inf), sc


def _check(curve, ffp, fh, pts, ks, R):
    R3 = tuple(a[None] for a in R)
    rx, ry, rinf = jac_to_affine(ffp, R3)
    want = host.ec_msm(fh, pts, ks)
    if want is host.INF:
        assert bool(np.asarray(rinf)[0])
        return
    got = (int(ffp.decode(np.asarray(rx))[0]),
           int(ffp.decode(np.asarray(ry))[0]))
    assert got == want


@pytest.mark.slow
def test_pallas_ec_kernels_interpret(pallas_on):
    from gnark_tpu.ec.pallas_ec import jac_add_p, jac_add_mixed_p, jac_double_p
    curve, ffp, fh, pts, ks, points, sc = _setup(4)
    P = affine_to_jacobian(ffp, points)
    for name, got_j, want_fn in [
        ("add", jac_add_p(ffp, P, P), host.ec_dbl),
        ("dbl", jac_double_p(ffp, P), host.ec_dbl),
    ]:
        x, y, inf = jac_to_affine(ffp, got_j)
        xs, ys, infs = ffp.decode(np.asarray(x)), ffp.decode(np.asarray(y)), np.asarray(inf)
        for i, p in enumerate(pts):
            w = want_fn(fh, p)
            if w is host.INF:
                assert infs[i], name
            else:
                assert (int(xs[i]), int(ys[i])) == w, name
    # mixed add vs plain add
    mix = jac_add_mixed_p(ffp, P, points)
    x, y, inf = jac_to_affine(ffp, mix)
    xs, ys = ffp.decode(np.asarray(x)), ffp.decode(np.asarray(y))
    for i, p in enumerate(pts):
        w = host.ec_dbl(fh, p)
        if w is not host.INF:
            assert (int(xs[i]), int(ys[i])) == w


