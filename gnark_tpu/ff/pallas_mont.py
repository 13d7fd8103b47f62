"""Pallas building blocks: Montgomery limb arithmetic in transposed
(L, T) layout, for use INSIDE TPU kernels.

Why this exists (the perf story): the portable jnp field ops express the
CIOS limb loop as a lax.scan — O(1) graph size, but on TPU every scan
iteration costs ~1us of loop overhead, so an MSM spends most of its
time in while-loop bookkeeping (measured: a complete mixed-add chain is
latency- not throughput-bound). Inside a Pallas kernel the limb loop is
fully unrolled into straight-line VPU code at tiny compile cost, and a
whole EC group operation becomes ONE kernel (gnark_tpu.ec.pallas_ec).

Layout: a block of T field elements is an (L, T) uint32 array — limb
index on sublanes, batch on lanes — so every limb row op is a full
(1, T) vector op and a 16-limb field fits two native (8, 128) tiles
when T = 128.

These are *pure functions on arrays*, not kernels; pallas kernels
compose them and handle blocking. Everything is also valid plain JAX,
so CPU tests run them directly (and in pallas interpret mode).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from gnark_tpu.fields import LIMB_BITS, FieldParams

_MASK = np.uint32((1 << LIMB_BITS) - 1)
_DT = jnp.uint32


class TFF:
    """Field-op helpers over (L, T) transposed limb blocks.

    Pallas kernels may not capture array constants, so the modulus and
    Montgomery-one columns are kernel INPUTS: call bind(pcol, onecol)
    inside the kernel with the (L, 1) refs and use the bound view.
    """

    def __init__(self, params: FieldParams):
        self.p = params
        self.n = params.nlimbs
        self.P_col = np.array(params.to_limbs(params.modulus),
                              dtype=np.uint32).reshape(-1, 1)
        self.one_col = np.array(params.to_limbs(params.R_mod),
                                dtype=np.uint32).reshape(-1, 1)
        self.n0inv = np.uint32(params.n0inv)

    def bind(self, pcol, onecol) -> "TFF":
        import copy
        t = copy.copy(self)
        t.P_col = pcol
        t.one_col = onecol
        return t

    def consts(self):
        """Host (L,1) np arrays to pass as kernel inputs."""
        return (np.asarray(self.P_col), np.asarray(self.one_col))

    # -- helpers -----------------------------------------------------------

    def _z1(self, x):
        return jnp.zeros((1,) + x.shape[1:], _DT)

    def _carry(self, acc, out_n):
        """Full ripple normalize: (m, T) lazy -> (out_n, T) limbs < 2^16."""
        rows = []
        c = jnp.zeros(acc.shape[1:], _DT)
        m = acc.shape[0]
        for i in range(out_n):
            t = (acc[i] if i < m else jnp.zeros_like(c)) + c
            rows.append(t & _MASK)
            c = t >> LIMB_BITS
        return jnp.stack(rows, 0)

    def _sub_borrow(self, a, b):
        """a - b rowwise; returns (diff, borrow) — all (k, T) / (T,)."""
        base = np.uint32(1 << LIMB_BITS)
        rows = []
        borrow = jnp.zeros(a.shape[1:], _DT)
        for i in range(a.shape[0]):
            t = a[i] + base - b[i] - borrow
            rows.append(t & _MASK)
            borrow = jnp.asarray(1, _DT) - (t >> LIMB_BITS)
        return jnp.stack(rows, 0), borrow

    def _cond_sub_p(self, a):
        """Reduce (< 2p, width n or n+1) into [0, p)."""
        m = a.shape[0]
        P = jnp.asarray(self.P_col)
        if m > self.n:
            P = jnp.concatenate(
                [P, jnp.zeros((m - self.n,) + P.shape[1:], _DT)], 0)
        d, borrow = self._sub_borrow(a, P)
        keep = (borrow != 0)[None]
        return jnp.where(keep, a, d)[: self.n]

    # -- ring ops ----------------------------------------------------------

    def add(self, a, b):
        return self._cond_sub_p(self._carry(a + b, self.n + 1))

    def sub(self, a, b):
        s = self._carry(a + self.P_col, self.n + 1)
        b1 = jnp.concatenate([b, self._z1(b)], 0)
        d, _ = self._sub_borrow(s, b1)
        return self._cond_sub_p(d)

    def double(self, a):
        return self.add(a, a)

    def neg(self, a):
        d, _ = self._sub_borrow(jnp.broadcast_to(jnp.asarray(self.P_col),
                                                 a.shape), a)
        return jnp.where(self.is_zero(a)[None], a, d)

    def mul_small(self, a, k: int):
        if k == 0:
            return jnp.zeros_like(a)
        if k == 1:
            return a
        r = None
        base = a
        while k:
            if k & 1:
                r = base if r is None else self.add(r, base)
            k >>= 1
            if k:
                base = self.double(base)
        return r

    def mul(self, a, b):
        """CIOS Montgomery product, fully unrolled. a, b: (n, T)."""
        n = self.n
        P = jnp.asarray(self.P_col)  # (n, 1)
        z1 = self._z1(a)
        acc = jnp.zeros((n + 1,) + a.shape[1:], _DT)
        for i in range(n):
            pij = a[i][None] * b                       # (n, T)
            acc = acc + jnp.concatenate([pij & _MASK, z1], 0)
            acc = acc + jnp.concatenate([z1, pij >> LIMB_BITS], 0)
            m = (acc[0][None] & _MASK) * self.n0inv & _MASK
            q = m * P                                  # (n, T)
            acc = acc + jnp.concatenate([q & _MASK, z1], 0)
            acc = acc + jnp.concatenate([z1, q >> LIMB_BITS], 0)
            # retire limb 0 and shift down (no scatter: Mosaic has no
            # scatter-add primitive)
            carry = acc[0] >> LIMB_BITS
            acc = jnp.concatenate([(acc[1] + carry)[None], acc[2:], z1], 0)
        return self._cond_sub_p(self._carry(acc, n + 1))

    def square(self, a):
        return self.mul(a, a)

    # -- predicates / select -----------------------------------------------

    def is_zero(self, a):
        return jnp.all(a == 0, axis=0)

    def select(self, cond, a, b):
        """cond: (T,) bool."""
        return jnp.where(cond[None], a, b)

    def zeros(self, T):
        T = (T,) if isinstance(T, int) else tuple(T)
        return jnp.zeros((self.n,) + T, _DT)

    def ones(self, T):
        T = (T,) if isinstance(T, int) else tuple(T)
        one = jnp.asarray(self.one_col).reshape(
            (self.n,) + (1,) * len(T))
        return jnp.broadcast_to(one, (self.n,) + T)
