"""NTT vs naive DFT oracle (Python ints)."""

import random

import numpy as np
import pytest

from gnark_tpu.ff import get_ff
from gnark_tpu.ntt import Domain


def naive_dft(coeffs, omega, p):
    n = len(coeffs)
    return [
        sum(c * pow(omega, i * j, p) for j, c in enumerate(coeffs)) % p
        for i in range(n)
    ]


@pytest.mark.parametrize("n", [2, 8, 32])
def test_fft_matches_naive(n):
    ff = get_ff("bn254_fr")
    p = ff.p.modulus
    dom = Domain(ff, n)
    rng = random.Random(42)
    coeffs = [rng.randrange(p) for _ in range(n)]
    got = ff.decode(np.asarray(dom.fft(np.asarray(ff.encode(coeffs)))))
    want = naive_dft(coeffs, dom.omega, p)
    assert [int(g) for g in got] == want


@pytest.mark.parametrize("coset", [False, True])
def test_roundtrip(coset):
    ff = get_ff("bn254_fr")
    p = ff.p.modulus
    n = 64
    dom = Domain(ff, n)
    rng = random.Random(7)
    coeffs = [rng.randrange(p) for _ in range(n)]
    x = np.asarray(ff.encode(coeffs))
    back = ff.decode(np.asarray(dom.ifft(dom.fft(x, coset=coset), coset=coset)))
    assert [int(b) for b in back] == coeffs


def test_coset_evaluation():
    ff = get_ff("bn254_fr")
    p = ff.p.modulus
    n = 16
    dom = Domain(ff, n)
    rng = random.Random(3)
    coeffs = [rng.randrange(p) for _ in range(n)]
    got = ff.decode(np.asarray(dom.fft(np.asarray(ff.encode(coeffs)), coset=True)))
    g = dom.coset_gen
    for i in range(n):
        x = g * pow(dom.omega, i, p) % p
        want = sum(c * pow(x, j, p) for j, c in enumerate(coeffs)) % p
        assert int(got[i]) == want


def test_babybear_domain():
    ff = get_ff("babybear")
    p = ff.p.modulus
    n = 8
    dom = Domain(ff, n)
    coeffs = [i * 1234567 % p for i in range(n)]
    got = ff.decode(np.asarray(dom.fft(np.asarray(ff.encode(coeffs)))))
    want = naive_dft(coeffs, dom.omega, p)
    assert [int(g) for g in got] == want


@pytest.mark.parametrize("n", [1 << 6, 1 << 7])
def test_fourstep_matches_reference_path(n):
    """Four-step fused-stage NTT (ntt/fourstep.py) == the per-stage
    reference path, forward and inverse, even and odd log2(n)."""
    import jax.numpy as jnp

    from gnark_tpu.ntt.domain import _ntt_kernel
    from gnark_tpu.ntt.fourstep import FourStep
    ff = get_ff("bn254_fr")
    p = ff.p.modulus
    dom = Domain(ff, n)
    rng = random.Random(7)
    vals = [rng.randrange(p) for _ in range(n)]
    v = jnp.asarray(ff.encode(vals))
    ref = np.asarray(_ntt_kernel(ff, v, dom._rev, dom._tw_fwd))
    got = np.asarray(FourStep(ff, n, dom.omega)(v))
    assert np.array_equal(ref, got)
    refi = np.asarray(_ntt_kernel(ff, v, dom._rev, dom._tw_inv))
    goti = np.asarray(FourStep(ff, n, dom.omega_inv)(v))
    assert np.array_equal(refi, goti)
