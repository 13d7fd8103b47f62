"""Differential tests: device limb arithmetic vs Python-int oracle.

Mirrors the role of gnark-crypto's field test vectors (SURVEY.md §4:
"bit-exact vectors" strategy) — here the oracle is plain Python ints.
"""

import random

import numpy as np
import pytest

from gnark_tpu.ff import get_ff
from gnark_tpu.fields import FIELDS

FIELD_NAMES = ["bn254_fr", "bn254_fp", "bls12_381_fr", "bw6_761_fp", "tinyfield", "babybear"]


def rand_elems(p, k, seed):
    rng = random.Random(seed)
    special = [0, 1, 2, p - 1, p - 2, p // 2]
    return [special[i] if i < len(special) else rng.randrange(p) for i in range(k)]


@pytest.mark.parametrize("name", FIELD_NAMES)
def test_encode_decode_roundtrip(name):
    ff = get_ff(name)
    p = ff.p.modulus
    xs = rand_elems(p, 10, 1)
    enc = ff.encode(xs)
    dec = ff.decode(enc)
    assert [int(d) for d in dec] == xs


@pytest.mark.parametrize("name", FIELD_NAMES)
def test_add_sub_neg(name):
    ff = get_ff(name)
    p = ff.p.modulus
    xs = rand_elems(p, 12, 2)
    ys = rand_elems(p, 12, 3)
    a, b = ff.encode(xs), ff.encode(ys)
    got_add = ff.decode(np.asarray(ff.add(a, b)))
    got_sub = ff.decode(np.asarray(ff.sub(a, b)))
    got_neg = ff.decode(np.asarray(ff.neg(a)))
    for i, (x, y) in enumerate(zip(xs, ys)):
        assert int(got_add[i]) == (x + y) % p
        assert int(got_sub[i]) == (x - y) % p
        assert int(got_neg[i]) == (-x) % p


@pytest.mark.parametrize("name", FIELD_NAMES)
def test_mul_square(name):
    ff = get_ff(name)
    p = ff.p.modulus
    xs = rand_elems(p, 12, 4)
    ys = rand_elems(p, 12, 5)
    a, b = ff.encode(xs), ff.encode(ys)
    got_mul = ff.decode(np.asarray(ff.mul(a, b)))
    got_sq = ff.decode(np.asarray(ff.square(a)))
    for i, (x, y) in enumerate(zip(xs, ys)):
        assert int(got_mul[i]) == (x * y) % p, f"i={i}"
        assert int(got_sq[i]) == (x * x) % p


@pytest.mark.parametrize("name", ["bn254_fr", "tinyfield"])
def test_inv(name):
    ff = get_ff(name)
    p = ff.p.modulus
    xs = [x for x in rand_elems(p, 8, 6) if x != 0]
    a = ff.encode(xs)
    got = ff.decode(np.asarray(ff.inv(a)))
    for i, x in enumerate(xs):
        assert int(got[i]) == pow(x, -1, p)
    # inv(0) == 0
    z = ff.encode([0])
    assert int(ff.decode(np.asarray(ff.inv(z)))[0]) == 0


@pytest.mark.parametrize("name", ["bn254_fr"])
def test_mont_domain_device(name):
    ff = get_ff(name)
    p = ff.p.modulus
    xs = rand_elems(p, 6, 7)
    raw = ff.encode(xs, mont=False)
    m = ff.from_mont(ff.to_mont(np.asarray(raw)))  # raw->raw round trip? no:
    # to_mont treats input limbs as the value to lift: to_mont(raw(x)) = enc(x)
    got = ff.decode(np.asarray(ff.to_mont(raw)))
    assert [int(g) for g in got] == xs
    got2 = ff.decode(np.asarray(m), mont=False)
    assert [int(g) for g in got2] == xs


def test_mul_matches_jit():
    import jax

    ff = get_ff("bn254_fr")
    p = ff.p.modulus
    xs, ys = rand_elems(p, 4, 8), rand_elems(p, 4, 9)
    a, b = ff.encode(xs), ff.encode(ys)
    jmul = jax.jit(ff.mul)
    got = ff.decode(np.asarray(jmul(a, b)))
    for i, (x, y) in enumerate(zip(xs, ys)):
        assert int(got[i]) == (x * y) % p


def test_broadcasting():
    ff = get_ff("bn254_fr")
    p = ff.p.modulus
    xs = rand_elems(p, 6, 10)
    a = ff.encode(xs).reshape(2, 3, ff.n)
    y = rand_elems(p, 1, 11)[0]
    b = ff.encode([y])  # (1, n) broadcasts
    got = ff.decode(np.asarray(ff.mul(a, b)))
    for i in range(2):
        for j in range(3):
            assert int(got[i][j]) == (xs[i * 3 + j] * y) % p
