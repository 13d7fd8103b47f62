"""Pairing bilinearity / non-degeneracy tests (host Tate engine)."""

import pytest

from gnark_tpu.ec import curves, host
from gnark_tpu.pairing import get_pairing


@pytest.mark.parametrize("name", ["bn254", "bls12_377", "bls12_381",
                                  "bw6_761"])
def test_bilinear(name):
    c = curves.CURVES[name]
    pr = get_pairing(name)
    e = pr.pair(c.g1, c.g2)
    assert not pr.ext.eq(e, pr.ext.one), "degenerate pairing"
    a = pr.pair(host.ec_mul(c.host_fp, c.g1, 7), c.g2)
    b = pr.pair(c.g1, host.ec_mul(c.host_g2_field, c.g2, 7))
    assert pr.ext.eq(a, b)
    assert pr.ext.eq(a, pr.ext.pow(e, 7))


def test_pairing_product_bn254():
    c = curves.CURVES["bn254"]
    pr = get_pairing("bn254")
    f2 = c.host_g2_field
    # e(3P, Q) * e(-3P, Q) == 1  (multi-pairing folds into one final exp)
    P3 = host.ec_mul(c.host_fp, c.g1, 3)
    res = pr.pairing_product([(P3, c.g2), (host.ec_neg(c.host_fp, P3), c.g2)])
    assert pr.ext.eq(res, pr.ext.one)


# -- optimal ate engine (pairing/ate.py) -------------------------------------

@pytest.mark.parametrize("name", ["bn254", "bls12_377", "bls12_381"])
def test_ate_bilinear(name):
    from gnark_tpu.pairing.ate import get_ate
    c = curves.CURVES[name]
    ate = get_ate(name)
    e = ate.pair(c.g1, c.g2)
    assert not ate.ext.eq(e, ate.ext.one), "degenerate"
    assert ate.ext.eq(ate.ext.pow(e, ate.r), ate.ext.one), "not order r"
    a = ate.pair(host.ec_mul(c.host_fp, c.g1, 5), c.g2)
    b = ate.pair(c.g1, host.ec_mul(c.host_g2_field, c.g2, 5))
    assert ate.ext.eq(a, b)
    assert ate.ext.eq(a, ate.ext.pow(e, 5))


def test_ate_agrees_with_tate_on_products():
    """Both engines must accept/reject the same pairing-product
    equations (they are powers of one another)."""
    from gnark_tpu.pairing.ate import get_ate
    c = curves.CURVES["bn254"]
    ate, tate = get_ate("bn254"), get_pairing("bn254")
    P3 = host.ec_mul(c.host_fp, c.g1, 3)
    nP3 = host.ec_neg(c.host_fp, P3)
    good = [(P3, c.g2), (nP3, c.g2)]
    assert ate.ext.eq(ate.pairing_product(good), ate.ext.one)
    assert tate.ext.eq(tate.pairing_product(good), tate.ext.one)
    bad = [(P3, c.g2), (c.g1, c.g2)]
    assert not ate.ext.eq(ate.pairing_product(bad), ate.ext.one)
    assert not tate.ext.eq(tate.pairing_product(bad), tate.ext.one)
