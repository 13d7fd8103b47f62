"""Four-step (Bailey) NTT with fused-stage Pallas row kernels.

The round-2 NTT ran each butterfly stage as its own device pass over
HBM plus one 2^20-row bit-reverse gather — measured ~10x above compute
(tools/ntt_probe.py). This is the TPU-native replacement for large
domains (the reference's fft.Domain hot path,
backend/groth16/bn254/prove.go:346-389):

  split n = n1 * n2 (n1, n2 <= 2^11). With j = j2*n1 + j1 and
  k = k1*n2 + k2:

      X[k1*n2 + k2] = DFT_n1over_j1( w^(j1*k2) * DFT_n2over_j2(x)[j1,k2] )

  * pass 1: n1 independent n2-point row FFTs — ONE pallas kernel, all
    log2(n2) stages in VMEM (radix-2 DIF: natural in, bit-reversed
    out; the mid twiddle table absorbs the bit-reversal);
  * mid twiddle: one elementwise field mul;
  * pass 2: same kernel over the transposed matrix;
  * order fix: two slab gathers (take along axis 0) + a transpose —
    no per-element gather anywhere.

Data moves through the passes in TRANSPOSED (L, rows, S) limb layout
so every field op in the kernel is a full-width VPU op; all
arithmetic uses the lazy <= 2p class (ff/pallas_mont.py), canonical-
ized once at the end of each pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gnark_tpu.ec.pallas_ec import _interpret
from gnark_tpu.ff import FF
from gnark_tpu.ff.pallas_mont import TFF

_ROWS = 8          # rows per grid step (sublane tile)


@functools.lru_cache(maxsize=None)
def _tff(name: str) -> TFF:
    from gnark_tpu.fields import FIELDS
    return TFF(FIELDS[name])


def _bitrev(n: int) -> np.ndarray:
    k = n.bit_length() - 1
    idx = np.arange(n, dtype=np.int32)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(k):
        rev |= ((idx >> b) & 1) << (k - 1 - b)
    return rev


def _dif_stage_tw(ff: FF, S: int, w: int):
    """(stages, L, 1, S) per-position DIF twiddles, Montgomery form:
    1 on the top half of each block, w_m^(i mod half) on the bottom
    half (the bottom output is (a-b)*w^j)."""
    q = ff.p.modulus
    k = S.bit_length() - 1
    out = np.empty((k, ff.n, 1, S), dtype=np.uint32)
    for s in range(k):                      # m = S >> s, large -> small
        m = S >> s
        half = m >> 1
        wm = pow(w, S // m, q)
        wp = [1] * half                     # wm^0 .. wm^(half-1)
        for j in range(1, half):
            wp[j] = wp[j - 1] * wm % q
        vals = []
        for i in range(S):
            j = i % m
            vals.append(wp[j - half] if j >= half else 1)
        enc = ff.encode(vals)               # (S, L)
        out[s] = np.ascontiguousarray(enc.T)[:, None, :]
    return out


def _consts3_bcast(f: TFF, S: int):
    """TFF constant columns pre-broadcast to (L, 1, S): Mosaic cannot
    broadcast a (1,1) scalar into both sublanes and lanes, so 3D-block
    kernels need lane-wide constant rows."""
    return tuple(
        np.ascontiguousarray(np.broadcast_to(c[:, :, None],
                                             (f.n, 1, S)))
        for c in f.consts3())


def _row_fft_kernel(f: TFF, L: int, S: int, R: int, k: int):
    """All k = log2(S) DIF stages over a (L, R, S) block in VMEM."""

    def kernel(pcol, onecol, p2col, tws, xr, out):
        fb = f.bind(pcol[:], onecol[:], p2col[:])
        x = xr[:]                              # (L, R, S) <= 2p
        pos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, S), 2)
        for s in range(k):
            m = S >> s
            half = m >> 1
            first = (pos % m) < half
            u = pltpu.roll(x, S - half, 2)     # i+half -> i (cyclic)
            v = pltpu.roll(x, half, 2)         # i-half -> i
            pre = jnp.where(first, fb.add2p(x, u), fb.sub2p(v, x))
            x = fb.mul_lazy(pre, tws[s])
        out[:] = fb.canon(x)

    return kernel


@functools.partial(jax.jit, static_argnums=(0,))
def _row_fft(ff: FF, xt, tws):
    """xt: (L, n1, S) transposed-limb rows; all-stage DIF per row.
    Output bit-reversed within each row, canonical."""
    f = _tff(ff.p.name)
    L, n1, S = xt.shape
    k = S.bit_length() - 1
    R = min(_ROWS, n1)
    cspec = pl.BlockSpec((L, 1, S), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _row_fft_kernel(f, L, S, R, k),
        out_shape=jax.ShapeDtypeStruct((L, n1, S), jnp.uint32),
        grid=(n1 // R,),
        in_specs=[cspec, cspec, cspec,
                  pl.BlockSpec((k, L, 1, S), lambda i: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((L, R, S), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((L, R, S), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(*_consts3_bcast(f, S), tws, xt)


class FourStep:
    """Precomputed four-step plan for one (field, n, omega) triple."""

    def __init__(self, ff: FF, n: int, w: int):
        self.ff = ff
        self.n = n
        q = ff.p.modulus
        k = n.bit_length() - 1
        k2 = (k + 1) // 2
        self.S = 1 << k2                    # row length (pass size)
        self.n1 = n // self.S               # number of rows
        assert self.n1 <= self.S
        self.tw_rows = jnp.asarray(_dif_stage_tw(ff, self.S, pow(
            w, n // self.S, q)))
        # pass-2 twiddles for rows of length n1 (may differ from S)
        if self.n1 != self.S:
            self.tw_rows2 = jnp.asarray(_dif_stage_tw(
                ff, self.n1, pow(w, n // self.n1, q)))
        else:
            self.tw_rows2 = self.tw_rows
        # mid twiddle with pass-1 bit-reversal baked in:
        # M[j1, pos] = w^(j1 * rev_S(pos))
        rev = _bitrev(self.S)
        wj = [pow(w, j1, q) for j1 in range(self.n1)]
        mid = np.empty((self.n1, self.S), dtype=object)
        for j1 in range(self.n1):
            base = wj[j1]
            # w^(j1*k2) for k2 = rev(pos)
            row = [pow(base, int(rev[p]), q) for p in range(self.S)]
            mid[j1] = row
        enc = ff.encode(list(mid.reshape(-1)))          # (n, L)
        self.mid = jnp.asarray(
            np.ascontiguousarray(enc.reshape(self.n1, self.S, ff.n)
                                 .transpose(2, 0, 1)))   # (L, n1, S)
        self.rev_S = jnp.asarray(rev)
        self.rev_n1 = jnp.asarray(_bitrev(self.n1))

    def __call__(self, x):
        """x: (n, L) canonical -> DFT in natural order, canonical."""
        ff = self.ff
        L = ff.n
        n1, S = self.n1, self.S
        # A[j2][j1] with j = j2*n1 + j1 -> transpose to rows over j2
        A = x.reshape(S, n1, L)             # j2 rows (j1 minor)
        At = jnp.transpose(A, (2, 1, 0))    # (L, n1, S): row j1, pos j2
        Y = _row_fft(ff, At, self.tw_rows)  # (L, n1, S) k2 bit-rev'd
        Z = _mid_mul(ff, Y, self.mid)       # twiddle (rev baked in)
        # pass 2: FFT over j1 for each k2-position: transpose rows
        Zt = jnp.transpose(Z, (0, 2, 1))    # (L, S, n1)
        W = _row_fft(ff, Zt, self.tw_rows2)  # rows: rev-k2 pos, k1 rev'd
        # W[pos2][pos1] = X[rev(pos1)*n2... fix order with slab ops:
        # X.reshape(n1, S)[k1, k2] = W[rev_S(k2), rev_n1(k1)]
        Wn = jnp.transpose(W, (1, 2, 0))    # (S, n1, L)
        B = jnp.take(Wn, self.rev_S, axis=0)
        C = jnp.transpose(B, (1, 0, 2))     # (n1, S, L)
        D = jnp.take(C, self.rev_n1, axis=0)
        return D.reshape(self.n, L)


@functools.partial(jax.jit, static_argnums=(0,))
def _mid_mul(ff: FF, a, b):
    """Elementwise field mul over (L, n1, S) transposed blocks."""
    f = _tff(ff.p.name)
    L, n1, S = a.shape
    R = min(_ROWS, n1)

    def kernel(pcol, onecol, p2col, xr, yr, out):
        fb = f.bind(pcol[:], onecol[:], p2col[:])
        out[:] = fb.canon(fb.mul_lazy(xr[:], yr[:]))

    cspec = pl.BlockSpec((L, 1, S), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((L, R, S), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, n1, S), jnp.uint32),
        grid=(n1 // R,),
        in_specs=[cspec, cspec, cspec, bspec, bspec],
        out_specs=bspec,
        interpret=_interpret(),
    )(*_consts3_bcast(f, S), a, b)
