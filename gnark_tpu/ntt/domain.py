"""Radix-2 NTT domains over 2-adic prime fields.

TPU-native equivalent of gnark-crypto's `fft.Domain` (the exact op set a
Groth16/PLONK prover needs is FFT / FFTInverse, both optionally on a
coset of the multiplicative generator — reference:
backend/groth16/bn254/prove.go:346-389, SURVEY.md §7 step 2).

Layout: vectors of field elements shaped (n, nlimbs) in Montgomery
form.  The transform is an iterative Cooley-Tukey DIT over natural
order (bit-reverse gather first), each stage one batched butterfly:
one field-mul of n/2 elements + add/sub.  All twiddles are precomputed
host-side and passed as device arrays (a pytree arg, not baked-in
constants, so jit caching works across domains of the same size).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gnark_tpu.ff import FF


def _bit_reverse_perm(n: int) -> np.ndarray:
    k = n.bit_length() - 1
    idx = np.arange(n, dtype=np.int32)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(k):
        rev |= ((idx >> b) & 1) << (k - 1 - b)
    return rev


def _mul_fn(ff: FF):
    """Stage-multiply: fused Pallas kernel on TPU (the scan-based mul is
    loop-overhead-bound there), portable jnp otherwise."""
    from gnark_tpu import config
    if config.use_pallas():
        from gnark_tpu.ff.pallas_ops import mul_p

        def mul(a, b):
            shp = a.shape
            return mul_p(ff, a.reshape(-1, ff.n),
                         jnp.broadcast_to(b, shp).reshape(-1, ff.n)
                         ).reshape(shp)
        return mul
    return ff.mul


@functools.partial(jax.jit, static_argnums=(0,))
def _ntt_kernel(ff: FF, x, rev, stage_tw):
    """Core transform. stage_tw: tuple of (2^s-half,) twiddle arrays.

    On TPU each stage is ONE fused pallas butterfly pass
    (mul+add+sub together); portable path keeps the jnp pipeline."""
    from gnark_tpu import config
    n = x.shape[0]
    L = ff.n
    y = x[rev]
    if config.use_pallas():
        from gnark_tpu.ff.pallas_ops import butterfly_p
        for s, tw in enumerate(stage_tw, start=1):
            m = 1 << s
            half = m >> 1
            y = y.reshape(n // m, m, L)
            even = y[:, :half].reshape(-1, L)
            odd = y[:, half:].reshape(-1, L)
            ev, od = butterfly_p(ff, even, odd, tw[0], half)
            y = jnp.concatenate([ev.reshape(n // m, half, L),
                                 od.reshape(n // m, half, L)], axis=1)
        return y.reshape(n, L)
    mul = _mul_fn(ff)
    for s, tw in enumerate(stage_tw, start=1):
        m = 1 << s
        half = m >> 1
        y = y.reshape(n // m, m, ff.n)
        even = y[:, :half]
        odd = mul(y[:, half:], tw)
        y = jnp.concatenate([ff.add(even, odd), ff.sub(even, odd)], axis=1)
    return y.reshape(n, ff.n)


@functools.partial(jax.jit, static_argnums=(0,))
def _scale(ff: FF, x, sc):
    return _mul_fn(ff)(x, sc)


class Domain:
    """Evaluation domain of size n = 2^k with coset support.

    Semantics match gnark-crypto fft.Domain: `generator` is a primitive
    n-th root of unity, the coset is g*<omega> with g the field's
    multiplicative generator (a non-residue, so g^n != 1).
    """

    def __init__(self, ff: FF, n: int):
        if n & (n - 1) or n == 0:
            raise ValueError("domain size must be a power of two")
        self.ff = ff
        self.n = n
        p = ff.p.modulus
        self.omega = ff.p.root_of_unity(n) if n > 1 else 1
        self.omega_inv = pow(self.omega, -1, p)
        self.n_inv = pow(n, -1, p)
        self.coset_gen = ff.p.generator % p
        self.coset_gen_inv = pow(self.coset_gen, -1, p)

        self._rev = jnp.asarray(_bit_reverse_perm(n))
        self._tw_fwd = self._stage_twiddles(self.omega)
        self._tw_inv = self._stage_twiddles(self.omega_inv)
        self._fourstep: dict = {}
        # coset scale vectors g^i / g^-i, fused with 1 and n^-1 where used
        self._coset = jnp.asarray(ff.encode(
            [pow(self.coset_gen, i, p) for i in range(n)]))
        self._coset_inv_ninv = jnp.asarray(ff.encode(
            [pow(self.coset_gen_inv, i, p) * self.n_inv % p for i in range(n)]))
        self._ninv = jnp.asarray(ff.encode([self.n_inv]))

    def _stage_twiddles(self, w: int):
        """Per-stage twiddle arrays, Montgomery form, shapes (1, half, L)."""
        p = self.ff.p.modulus
        k = self.n.bit_length() - 1
        out = []
        for s in range(1, k + 1):
            m = 1 << s
            wm = pow(w, self.n // m, p)
            tw = self.ff.encode([pow(wm, j, p) for j in range(m // 2)])
            out.append(jnp.asarray(tw)[None, :, :])
        return tuple(out)

    # ------------------------------------------------------------------

    def _plan(self, inverse: bool):
        """Four-step fused-stage plan for large domains (ntt/fourstep):
        two in-VMEM row-FFT passes + one twiddle mul instead of log2(n)
        HBM passes + a 2^k-row bit-reverse gather. Gated by size (env
        GNARK_TPU_NTT_FOURSTEP_LOG, default 2^14) and the pallas
        config switch."""
        import os

        from gnark_tpu import config
        thresh = 1 << int(os.environ.get(
            "GNARK_TPU_NTT_FOURSTEP_LOG", "14"))
        if self.n < max(thresh, 4) or not config.use_pallas():
            return None
        if inverse not in self._fourstep:
            from gnark_tpu.ntt.fourstep import FourStep
            w = self.omega_inv if inverse else self.omega
            # plans may be built lazily while TRACING a caller's jit:
            # force their device constants to materialize eagerly so
            # the cached plan is reusable across traces (a traced
            # constant would leak, jax UnexpectedTracerError)
            with jax.ensure_compile_time_eval():
                self._fourstep[inverse] = FourStep(self.ff, self.n, w)
        return self._fourstep[inverse]

    def fft(self, x, coset: bool = False):
        """Coefficients -> evaluations on (coset of) the domain."""
        if self.n == 1:
            return x
        if coset:
            x = _scale(self.ff, x, self._coset)
        plan = self._plan(False)
        if plan is not None:
            return plan(x)
        return _ntt_kernel(self.ff, x, self._rev, self._tw_fwd)

    def ifft(self, y, coset: bool = False):
        """Evaluations on (coset of) the domain -> coefficients."""
        if self.n == 1:
            return y
        plan = self._plan(True)
        if plan is not None:
            x = plan(y)
        else:
            x = _ntt_kernel(self.ff, y, self._rev, self._tw_inv)
        if coset:
            return _scale(self.ff, x, self._coset_inv_ninv)
        return _scale(self.ff, x, self._ninv)
