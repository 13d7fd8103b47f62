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

import os

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
        # 2p column for the lazy (<= 2p) representation ops. 2p always
        # fits the limb count: every registered field has >= 2 spare
        # bits (e.g. bn254 fp: 254 bits in 16x16 = 256).
        self.P2_col = np.array(params.to_limbs(2 * params.modulus),
                               dtype=np.uint32).reshape(-1, 1)
        self.n0inv = np.uint32(params.n0inv)

    def bind(self, pcol, onecol, p2col=None) -> "TFF":
        import copy
        t = copy.copy(self)
        t.P_col = pcol
        t.one_col = onecol
        if p2col is not None:
            t.P2_col = p2col
        return t

    def consts(self):
        """Host (L,1) np arrays to pass as kernel inputs."""
        return (np.asarray(self.P_col), np.asarray(self.one_col))

    def consts3(self):
        """(P, one, 2P) — for kernels using the lazy 2p-class ops."""
        return (np.asarray(self.P_col), np.asarray(self.one_col),
                np.asarray(self.P2_col))

    def mont_col(self, k: int) -> np.ndarray:
        """(L,1) column of k*R mod p — a constant OPERAND for mul():
        mont-mul by it multiplies by plain k. In-kernel this is 2.1x
        cheaper than mul_small(9)'s double/add chain (measured
        tools/mul_bench.py: 396 vs 848 cycles at (16,512))."""
        par = self.p
        return np.array(par.to_limbs(k * par.R % par.modulus),
                        dtype=np.uint32).reshape(-1, 1)

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

    def _cond_sub_c(self, a, col):
        """Subtract the (n,1) column once if a >= it (width n or n+1)."""
        m = a.shape[0]
        P = jnp.asarray(col)
        if m > self.n:
            P = jnp.concatenate(
                [P, jnp.zeros((m - self.n,) + P.shape[1:], _DT)], 0)
        d, borrow = self._sub_borrow(a, P)
        keep = (borrow != 0)[None]
        return jnp.where(keep, a, d)[: self.n]

    def _cond_sub_p(self, a):
        """Reduce (< 2p, width n or n+1) into [0, p)."""
        return self._cond_sub_c(a, self.P_col)

    def _carry_signed(self, acc, out_n):
        """Ripple normalize SIGNED int32 lazy limbs (each in
        (-2^31, 2^31), total value nonnegative and < 2^(16*out_n)) to
        uint32 limbs < 2^16. Arithmetic >> is floor division, so
        negative intermediates carry exactly."""
        rows = []
        c = jnp.zeros(acc.shape[1:], jnp.int32)
        m = acc.shape[0]
        for i in range(out_n):
            t = (acc[i] if i < m else jnp.zeros_like(c)) + c
            rows.append((t & jnp.int32(0xFFFF)).astype(_DT))
            c = t >> 16
        return jnp.stack(rows, 0)

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

    # selects the CIOS lowering; "fuse" (per-iteration contribution
    # fusion) wins slightly on TPU Mosaic (tools/mul_bench.py
    # 679 -> 666 cycles) but SEGFAULTS the XLA:CPU compiler on large
    # programs (2^12-domain prove stages, jax 0.9.0) — so "auto"
    # picks per backend. Env GNARK_TPU_CIOS forces either.
    cios_impl = os.environ.get("GNARK_TPU_CIOS", "auto")

    def _cios(self, prods):
        impl = self.cios_impl
        if impl == "auto":
            import jax
            impl = "fuse" if jax.default_backend() != "cpu" else "cat"
        if impl == "fuse":
            return self._cios_fuse(prods)
        return self._cios_cat(prods)

    def _cios_cat(self, prods):
        """Fused CIOS Montgomery sum of products: lazy (n+1, T)
        accumulator of sum_k a_k*b_k * R^-1. prods: [(a, b), ...] with
        a, b (n, T)-ish. Accumulator limbs stay < ~n*(2k+3)*2^16 —
        u32-safe up to k ~ 100 products."""
        n = self.n
        P = jnp.asarray(self.P_col)  # (n, 1)
        a0 = prods[0][0]
        z1 = self._z1(a0)
        acc = jnp.zeros((n + 1,) + a0.shape[1:], _DT)
        for i in range(n):
            for (a, b) in prods:
                pij = a[i][None] * b                   # (n, T)
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
        return acc

    def _cios_fuse(self, prods):
        """CIOS with per-iteration contribution FUSION: the k product
        rows and the q*P row are summed at aligned 16-row width first
        (lo/hi sums fit u32: <= (k+1)*2^16), then folded into the
        accumulator with ONE shifted-combine concat and ONE (n+1)-row
        add — versus the baseline's four concat copies + four
        (n+1)-row adds per outer iteration. Same contract as
        _cios_cat: lazy (n+1, T) accumulator of sum_k a_k*b_k * R^-1.
        Measured tools/mul_bench.py: 679 -> 666 cycles/mul @ (16,512)
        (Mosaic already fused most concat copies; kept for the small
        win and the simpler op stream)."""
        n = self.n
        P = jnp.asarray(self.P_col)
        a0 = prods[0][0]
        z1 = self._z1(a0)
        acc = jnp.zeros((n + 1,) + a0.shape[1:], _DT)
        for i in range(n):
            lo = hi = None
            for (a, b) in prods:
                pij = a[i][None] * b                   # (n, T)
                l, h = pij & _MASK, pij >> LIMB_BITS
                lo = l if lo is None else lo + l
                hi = h if hi is None else hi + h
            m = ((acc[0] + lo[0]) & _MASK) * self.n0inv & _MASK
            q = m[None] * P                            # (n, T)
            lo = lo + (q & _MASK)
            hi = hi + (q >> LIMB_BITS)
            # combined shifted contribution C = [lo, 0] + [0, hi]
            C = jnp.concatenate(
                [lo[0:1], lo[1:] + hi[:-1], hi[-1:]], 0)
            acc = acc + C
            # retire limb 0 (low 16 bits now 0) and shift down
            carry = acc[0] >> LIMB_BITS
            acc = jnp.concatenate([(acc[1] + carry)[None], acc[2:], z1], 0)
        return acc

    def mul(self, a, b):
        """CIOS Montgomery product, fully unrolled. a, b: (n, T)."""
        return self._cond_sub_p(self._carry(self._cios([(a, b)]),
                                            self.n + 1))

    def square(self, a):
        return self.mul(a, a)

    # -- lazy (<= 2p) representation ops -------------------------------------
    #
    # The EC formulas (ec/pallas_ec.py) run on representatives in
    # [0, 2p]: CIOS with <= 2p inputs yields < 2p without the final
    # conditional subtract (needs 4p < R — every registered field has
    # >= 2 spare limb bits), so each op saves one or two borrow-select
    # passes (measured tools/mul_bench.py: ~20-40% of op time).
    # Canonicalize with canon() at kernel boundaries.

    def mul_lazy(self, a, b):
        """a * b * R^-1 for a, b <= 2p; result < 2p, no cond-sub."""
        return self._carry(self._cios([(a, b)]), self.n + 1)[: self.n]

    def sop2(self, a1, b1, a2, b2):
        """a1*b1 + a2*b2 (Montgomery), inputs <= 2p, result <= 2p.
        One fused CIOS (~1.6x one mul) instead of 2 muls + 1 add."""
        acc = self._carry(self._cios([(a1, b1), (a2, b2)]), self.n + 1)
        return self._cond_sub_c(acc, self.P2_col)

    def sopk(self, prods):
        """sum_k a_k*b_k (Montgomery) for k <= 4 products, inputs
        <= 2p, result <= 2p (bound: out < (0.81k + 1)p needs two 2p
        subtracts from k = 3)."""
        assert 1 <= len(prods) <= 4
        acc = self._carry(self._cios(list(prods)), self.n + 1)
        acc = self._cond_sub_c(acc, self.P2_col)
        if len(prods) >= 3:
            acc = self._cond_sub_c(acc, self.P2_col)
        return acc

    def add2p(self, a, b):
        """a + b for a, b <= 2p; result <= 2p."""
        s = self._carry(a + b, self.n + 1)
        return self._cond_sub_c(s, self.P2_col)

    def sub2p(self, a, b):
        """a - b mod p for a, b <= 2p; result <= 2p (a + 2p - b with
        signed lazy limbs, then one conditional subtract)."""
        t = (a.astype(jnp.int32) - b.astype(jnp.int32)
             + jnp.asarray(self.P2_col).astype(jnp.int32))
        t = self._carry_signed(t, self.n + 1)
        return self._cond_sub_c(t, self.P2_col)

    def neg2p(self, a):
        """2p - a for a <= 2p: a valid representative of -a."""
        t = (jnp.asarray(self.P2_col).astype(jnp.int32)
             - a.astype(jnp.int32))
        return self._carry_signed(t, self.n + 1)[: self.n]

    def double2p(self, a):
        return self.add2p(a, a)

    def canon(self, a):
        """<= 2p -> canonical [0, p): two conditional subtracts."""
        return self._cond_sub_p(self._cond_sub_p(a))

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
