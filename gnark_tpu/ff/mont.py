"""Batched Montgomery field arithmetic in 16-bit limbs on uint32 lanes.

This is the TPU replacement for gnark-crypto's per-field generated
assembly (the reference's L0; every MSM/NTT/solver op bottoms out here —
see SURVEY.md §2.1 "gnark-crypto (EXTERNAL, native)" and §7 step 1).

Design notes (TPU-first):
  * No 64-bit integer multiplier on TPU -> 16-bit limbs: a 16x16 product
    fits exactly in a uint32 lane; lo/hi halves are accumulated lazily
    with ~2^22 headroom before any carry propagation.
  * Everything is shaped (..., nlimbs) and vectorized over the leading
    batch dims; the limb loops are static Python loops that unroll into
    a flat XLA graph (VPU elementwise ops, fully fused).
  * Values live in Montgomery form (R = 2^(16*nlimbs)) on device.
  * All control flow is branchless (select / masks) -> jit-safe.

Correctness oracle: plain Python ints (tests/test_ff.py differential
tests against `FieldParams` host arithmetic).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gnark_tpu.config import limb_unroll
from gnark_tpu.utils.jaxutil import match_vma
from gnark_tpu.fields import FIELDS, LIMB_BITS, LIMB_MASK, FieldParams

_DT = jnp.uint32
_MASK = np.uint32(LIMB_MASK)


class FF:
    """Field arithmetic over limb arrays of shape (..., nlimbs), uint32.

    Normalized representation: every limb < 2^16, value < modulus,
    Montgomery form (x*R mod p) unless a function says otherwise.
    """

    def __init__(self, params: FieldParams):
        self.p = params
        self.n = params.nlimbs
        self.P_np = np.array(params.to_limbs(params.modulus), dtype=np.uint32)
        self.n0inv = np.uint32(params.n0inv)
        self.one_np = np.array(
            params.to_limbs(params.R_mod), dtype=np.uint32
        )  # 1 in Montgomery form
        self.R2_np = np.array(params.to_limbs(params.R2_mod), dtype=np.uint32)
        self.zero_np = np.zeros(self.n, dtype=np.uint32)
        # exponent bits of p-2 (LSB first) for Fermat inversion
        e = params.modulus - 2
        self.pm2_bits = np.array(
            [(e >> i) & 1 for i in range(params.bits)], dtype=np.uint32
        )

    # ------------------------------------------------------------------
    # host <-> device
    # ------------------------------------------------------------------

    def encode(self, values, mont: bool = True) -> np.ndarray:
        """Python ints (nested lists / flat) -> limb array, Montgomery form."""
        arr = np.asarray(values, dtype=object)
        flat = arr.reshape(-1)
        out = np.empty((flat.size, self.n), dtype=np.uint32)
        p = self.p
        for i, v in enumerate(flat):
            x = int(v) % p.modulus
            if mont:
                x = p.to_mont(x)
            out[i] = p.to_limbs(x)
        return out.reshape(arr.shape + (self.n,))

    def encode_u64(self, arr_u64, mont: bool = False):
        """(..., nl) little-endian uint64 limbs -> (..., n) 16-bit limb
        array, pure numpy (no per-element Python) — the zero-copy path
        from the native solver's output into device kernels. mont=True
        converts on device (one Montgomery mul by R^2)."""
        a = np.ascontiguousarray(np.asarray(arr_u64, dtype=np.uint64))
        parts = np.stack(
            [(a >> np.uint64(16 * k)).astype(np.uint32) & np.uint32(0xFFFF)
             for k in range(4)], axis=-1)
        flat = parts.reshape(a.shape[:-1] + (a.shape[-1] * 4,))
        n = self.n
        if flat.shape[-1] >= n:
            out = flat[..., :n]
        else:
            pad = np.zeros(a.shape[:-1] + (n - flat.shape[-1],),
                           dtype=np.uint32)
            out = np.concatenate([flat, pad], axis=-1)
        if not mont:
            return out
        return self.to_mont(jnp.asarray(out))

    def limbs_from_u32(self, w):
        """(..., nw) uint32 words (the little-endian view of u64
        limbs) -> (..., n) 16-bit limb rows, pure XLA ops — the
        in-graph half of the zero-copy solver->device path: the host
        uploads raw u64 solver output (half the bytes of a 16-bit limb
        array) and the jit splits+converts, fused with whatever
        consumes it."""
        lo = w & jnp.uint32(0xFFFF)
        hi = w >> 16
        inter = jnp.stack([lo, hi], axis=-1).reshape(
            w.shape[:-1] + (w.shape[-1] * 2,))
        n = self.n
        if inter.shape[-1] >= n:
            return inter[..., :n]
        pad = jnp.zeros(w.shape[:-1] + (n - inter.shape[-1],),
                        jnp.uint32)
        return jnp.concatenate([inter, pad], axis=-1)

    @staticmethod
    def u64_view(arr_u64) -> np.ndarray:
        """Host zero-copy view: (..., nl) u64 -> (..., 2*nl) u32."""
        a = np.ascontiguousarray(np.asarray(arr_u64, dtype=np.uint64))
        return a.view(np.uint32).reshape(a.shape[:-1] +
                                         (a.shape[-1] * 2,))

    def decode(self, limbs, mont: bool = True) -> np.ndarray:
        """Limb array -> numpy object array of Python ints."""
        arr = np.asarray(limbs)
        shape = arr.shape[:-1]
        flat = arr.reshape(-1, self.n)
        out = np.empty(flat.shape[0], dtype=object)
        p = self.p
        for i in range(flat.shape[0]):
            x = p.from_limbs(flat[i])
            out[i] = p.from_mont(x) if mont else x
        return out.reshape(shape) if shape else out[0]

    def zeros(self, shape=()) -> jnp.ndarray:
        return jnp.zeros(tuple(shape) + (self.n,), dtype=_DT)

    def ones(self, shape=()) -> jnp.ndarray:
        return jnp.broadcast_to(
            jnp.asarray(self.one_np), tuple(shape) + (self.n,)
        )

    # ------------------------------------------------------------------
    # limb helpers
    # ------------------------------------------------------------------

    def _carry_prop(self, acc, out_n=None):
        """Normalize lazy limbs (< 2^32) to < 2^16 each. Returns (..., out_n).

        Carry ripple as a lax.scan over limb position (O(1) graph size —
        unrolling n limb iterations made whole-prover graphs explode in
        compile time; see also mul())."""
        m = acc.shape[-1]
        out_n = out_n or m
        if out_n > m:
            acc = jnp.concatenate(
                [acc, jnp.zeros(acc.shape[:-1] + (out_n - m,), _DT)], -1)
        x = jnp.moveaxis(acc[..., :out_n], -1, 0)  # (out_n, ...)

        def body(c, limb):
            t = limb + c
            return t >> LIMB_BITS, t & _MASK

        _, limbs = jax.lax.scan(body, match_vma(jnp.zeros(x.shape[1:], _DT), x), x,
                                unroll=limb_unroll())
        return jnp.moveaxis(limbs, 0, -1)

    def _sub_borrow(self, a, b):
        """a - b over normalized limb arrays of equal width.

        Returns (diff, borrow_out) with borrow_out==1 iff a < b.
        """
        base = np.uint32(1 << LIMB_BITS)
        shape = jnp.broadcast_shapes(a.shape, b.shape)
        a = jnp.moveaxis(jnp.broadcast_to(a, shape), -1, 0)
        b = jnp.moveaxis(jnp.broadcast_to(b, shape), -1, 0)

        def body(borrow, ab):
            ai, bi = ab
            t = ai + base - bi - borrow
            return jnp.asarray(1, _DT) - (t >> LIMB_BITS), t & _MASK

        borrow, limbs = jax.lax.scan(
            body, match_vma(match_vma(jnp.zeros(a.shape[1:], _DT), a), b), (a, b),
            unroll=limb_unroll())
        return jnp.moveaxis(limbs, 0, -1), borrow

    def _cond_sub_p(self, a):
        """Reduce a (normalized, < 2p, width n or n+1) into [0, p)."""
        m = a.shape[-1]
        P = np.zeros(m, dtype=np.uint32)
        P[: self.n] = self.P_np
        d, borrow = self._sub_borrow(a, jnp.asarray(P))
        keep = (borrow != 0)[..., None]
        return jnp.where(keep, a, d)[..., : self.n]

    # ------------------------------------------------------------------
    # ring ops
    # ------------------------------------------------------------------

    def add(self, a, b):
        s = a + b  # limbs < 2^17, lazy
        s = self._carry_prop(s, self.n + 1)
        return self._cond_sub_p(s)

    def sub(self, a, b):
        # a + p - b, then conditional reduce
        s = a + jnp.asarray(self.P_np)  # lazy < 2^17
        s = self._carry_prop(s, self.n + 1)
        d, _ = self._sub_borrow(s, jnp.concatenate(
            [b, jnp.zeros(b.shape[:-1] + (1,), _DT)], axis=-1))
        return self._cond_sub_p(d)

    def neg(self, a):
        d, _ = self._sub_borrow(jnp.broadcast_to(jnp.asarray(self.P_np), a.shape), a)
        return jnp.where(self.is_zero(a)[..., None], a, d)

    def mul(self, a, b):
        """Montgomery product: a*b*R^-1 mod p (CIOS, lazy carries).

        The outer CIOS loop is a lax.scan over a's limbs so the traced
        graph is O(1) in limb count (critical: EC formulas instantiate
        dozens of muls and unrolled CIOS made jac_add take minutes to
        compile)."""
        n = self.n
        P = jnp.asarray(self.P_np)  # (n,)
        bshape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
        a = jnp.broadcast_to(a, bshape + (n,))
        b = jnp.broadcast_to(b, bshape + (n,))
        zero1 = jnp.zeros(bshape + (1,), _DT)
        a_limbs = jnp.moveaxis(a, -1, 0)  # (n, ..., 1)-ish: (n, ...)

        def body(acc, ai):
            # acc += a[i] * b
            pij = ai[..., None] * b  # (..., n), exact in uint32
            acc = acc + jnp.concatenate([pij & _MASK, zero1], axis=-1)
            acc = acc + jnp.concatenate([zero1, pij >> LIMB_BITS], axis=-1)
            # m = (acc[0] mod 2^16) * n0inv mod 2^16
            m = ((acc[..., 0:1] & _MASK) * self.n0inv) & _MASK
            q = m * P  # (..., n)
            acc = acc + jnp.concatenate([q & _MASK, zero1], axis=-1)
            acc = acc + jnp.concatenate([zero1, q >> LIMB_BITS], axis=-1)
            # retire limb 0 (== 0 mod 2^16 by construction): shift down
            carry = acc[..., 0] >> LIMB_BITS
            acc = jnp.concatenate([acc[..., 1:], zero1], axis=-1)
            acc = acc.at[..., 0].add(carry)
            return acc, None

        acc = match_vma(match_vma(jnp.zeros(bshape + (n + 1,), _DT), b), a)
        acc, _ = jax.lax.scan(body, acc, a_limbs, unroll=limb_unroll())
        acc = self._carry_prop(acc, n + 1)
        return self._cond_sub_p(acc)

    def square(self, a):
        return self.mul(a, a)

    def double(self, a):
        return self.add(a, a)

    def mul_small(self, a, k: int):
        """a * small-int k (k >= 0, fits limb count growth of 1)."""
        if k == 0:
            return jnp.zeros_like(a)
        if k == 1:
            return a
        if k == 2:
            return self.double(a)
        if k == 3:
            return self.add(self.double(a), a)
        # generic: repeated doubling
        r = None
        base = a
        while k:
            if k & 1:
                r = base if r is None else self.add(r, base)
            k >>= 1
            if k:
                base = self.double(base)
        return r

    # ------------------------------------------------------------------
    # Montgomery domain conversion on device
    # ------------------------------------------------------------------

    def to_mont(self, a):
        return self.mul(a, jnp.asarray(self.R2_np))

    def from_mont(self, a):
        one = jnp.zeros_like(a).at[..., 0].set(1)
        return self.mul(a, one)

    # ------------------------------------------------------------------
    # predicates / select
    # ------------------------------------------------------------------

    def is_zero(self, a):
        return jnp.all(a == 0, axis=-1)

    def eq(self, a, b):
        return jnp.all(a == b, axis=-1)

    def select(self, cond, a, b):
        """cond ? a : b, cond shaped like batch dims."""
        return jnp.where(cond[..., None], a, b)

    # ------------------------------------------------------------------
    # exponentiation / inversion
    # ------------------------------------------------------------------

    def pow_bits(self, a, bits_lsb: jnp.ndarray):
        """a ** e where e is given as a static-length LSB-first bit array.

        Runs as a fori_loop (compiled once), MSB->LSB.
        """
        nbits = bits_lsb.shape[0]
        one = match_vma(jnp.asarray(self.ones(a.shape[:-1])), a)

        def body(i, r):
            r = self.square(r)
            bit = bits_lsb[nbits - 1 - i]
            return self.select(jnp.broadcast_to(bit != 0, a.shape[:-1]),
                               self.mul(r, a), r)

        return jax.lax.fori_loop(0, nbits, body, one)

    def inv(self, a):
        """Batched inversion via Fermat (a^(p-2)); inv(0) = 0."""
        return self.pow_bits(a, jnp.asarray(self.pm2_bits))

    def batch_inv(self, a):
        """Montgomery batch inversion on device: two parallel prefix/
        suffix product scans + ONE Fermat inversion of the total
        product (vs inv()'s ~2*bits muls per element). Zero entries
        invert to zero like gnark's BatchInvert (they are masked to 1
        for the scans and zeroed in the output)."""
        if a.ndim != 2 or a.shape[0] < 4:
            return self.inv(a)
        z = self.is_zero(a)
        ones = jnp.broadcast_to(jnp.asarray(self.one_np), a.shape)
        ax = self.select(z, ones, a)
        pref = jax.lax.associative_scan(self.mul, ax, axis=0)
        suf = jax.lax.associative_scan(self.mul, ax, axis=0,
                                       reverse=True)
        tinv = self.inv(pref[-1:])
        pe = jnp.concatenate([ones[:1], pref[:-1]], axis=0)
        se = jnp.concatenate([suf[1:], ones[:1]], axis=0)
        out = self.mul(self.mul(pe, se),
                       jnp.broadcast_to(tinv, a.shape))
        return self.select(z, jnp.zeros_like(a), out)


@functools.lru_cache(maxsize=None)
def get_ff(name: str) -> FF:
    return FF(FIELDS[name])
