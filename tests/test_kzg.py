"""KZG commit/open/verify roundtrip (+ batch opening)."""

import random

import pytest

from gnark_tpu.backend import kzg

RNG = random.Random(5)


@pytest.fixture(scope="module")
def srs():
    return kzg.setup_srs("bn254", 16, rng=random.Random(11))


def test_kzg_roundtrip(srs):
    q = srs.curve.fr.modulus
    poly = [RNG.randrange(q) for _ in range(8)]
    C = kzg.commit(srs, poly)
    z = RNG.randrange(q)
    prf = kzg.open_at(srs, poly, z)
    assert kzg.verify_opening(srs, C, prf, z)
    # wrong value must fail
    bad = kzg.OpeningProof(h=prf.h, claimed_value=(prf.claimed_value + 1) % q)
    assert not kzg.verify_opening(srs, C, bad, z)


def test_kzg_batch(srs):
    q = srs.curve.fr.modulus
    polys = [[RNG.randrange(q) for _ in range(6)] for _ in range(3)]
    cs = [kzg.commit(srs, p) for p in polys]
    z, ch = RNG.randrange(q), RNG.randrange(q)
    prf = kzg.batch_open_single_point(srs, polys, z, ch)
    assert kzg.batch_verify_single_point(srs, cs, prf, z, ch)
    prf.claimed_values[1] = (prf.claimed_values[1] + 1) % q
    assert not kzg.batch_verify_single_point(srs, cs, prf, z, ch)
