"""Sort-based Pippenger MSM (TPU fast path).

The scan-based kernel (pippenger._msm_kernel) pays a per-iteration
gather/scatter + kernel-launch cost that dominates on real TPU
(measured ~500us/step). This variant eliminates the sequential scan:

  per window (processed in chunks of `wc` windows):
    1. argsort points by digit (int sort, cheap)
    2. segmented suffix-scan over the sorted points: log2(n) passes of
       ONE wide fused-Pallas complete add each — after the scan, the
       first element of every digit-segment holds the segment's sum
    3. one masked scatter writes segment sums into the bucket array
    4. bucket reduction sum_j j*B_j via two log-depth suffix scans
  then the classic Horner ladder over windows.

EC-add work: n*log2(n) per window (vs the ideal n) — the log factor is
the price of full vectorization without VMEM scatter; a future Pallas
kernel owning buckets in VMEM scratch removes it. All heavy adds are
single wide pallas_call's, so runtime is bandwidth/ALU-bound instead of
launch-bound.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from gnark_tpu.msm.pippenger import (
    _group_ops, _pick_params, _suffix_sums, window_digits,
)
from gnark_tpu.ec.weierstrass import (
    affine_to_jacobian, jac_add, jac_inf,
)
from gnark_tpu.utils.jaxutil import match_vma


def _flat_add(f, add_fn, S, T):
    """Complete add on pytrees with any leading dims (flattened)."""
    if add_fn is jac_add:
        return add_fn(f, S, T)
    shp = S[0].shape
    Sf = tuple(a.reshape(-1, a.shape[-1]) for a in S)
    Tf = tuple(a.reshape(-1, a.shape[-1]) for a in T)
    R = add_fn(f, Sf, Tf)
    return tuple(a.reshape(shp) for a in R)


@functools.partial(jax.jit, static_argnums=(0, 3, 4, 5))
def _msm_kernel_sorted(f, points, digits, nbits: int, c: int, wc: int):
    add_fn, _, double_fn = _group_ops(f)
    x, y, inf = points
    n = x.shape[0]
    W = digits.shape[1]
    B = 1 << c
    L = x.shape[-1]
    nsteps = max(n - 1, 0).bit_length()

    def chunk_body(d):
        """d: (wc, n) digit rows -> per-window sums (wc, ...)."""
        order = jnp.argsort(d, axis=1)
        ds = jnp.take_along_axis(d, order, 1)           # sorted digits
        px, py, pinf = x[order], y[order], inf[order]   # (wc, n, ...)

        # lift to Jacobian; digit-0 entries masked to infinity so they
        # never contribute (bucket 0 is skipped anyway)
        dead = pinf | (ds == 0)
        S = affine_to_jacobian(f, (px, py, dead))

        # segmented suffix scan (segments = equal sorted digits)
        idx = jnp.arange(n, dtype=jnp.int32)[None]      # (1, n)
        for k in range(nsteps):
            sh = 1 << k
            valid = (idx + sh) < n                      # (1, n)
            same = jnp.concatenate(
                [ds[:, sh:] == ds[:, :-sh],
                 jnp.zeros((ds.shape[0], sh), bool)], 1)
            m = valid & same                            # (wc, n)
            def shift(a):
                rolled = jnp.roll(a, -sh, axis=1)
                mm = m.reshape(m.shape + (1,) * (a.ndim - 2))
                return jnp.where(mm, rolled, jnp.zeros((), a.dtype))
            T = tuple(shift(a) for a in S)
            S = _flat_add(f, add_fn, S, T)

        # scatter segment heads into buckets (dump non-heads at slot B)
        head = jnp.concatenate(
            [jnp.ones((ds.shape[0], 1), bool), ds[:, 1:] != ds[:, :-1]], 1)
        slot = jnp.where(head, ds, B)                   # (wc, n)
        row = jnp.arange(ds.shape[0], dtype=jnp.int32)[:, None]
        flat_idx = (row * (B + 1) + slot).reshape(-1)
        bk = tuple(
            a.reshape((ds.shape[0] * (B + 1),) + a.shape[2:])
            for a in jac_inf(f, (ds.shape[0], B + 1)))
        bk = tuple(match_vma(b, x) for b in bk)
        Sf = tuple(a.reshape((-1,) + a.shape[2:]) for a in S)
        bk = tuple(b.at[flat_idx].set(v) for b, v in zip(bk, Sf))
        bk = tuple(b.reshape((ds.shape[0], B + 1) + b.shape[1:])
                   for b in bk)

        # sum_j j*B_j over buckets 1..B-1: two suffix scans
        tail = tuple(a[:, 1:B] for a in bk)             # (wc, B-1, ...)
        suf = _suffix_sums(f, tail, B - 1, axis=1, add_fn=add_fn)
        tot = _suffix_sums(f, suf, B - 1, axis=1, add_fn=add_fn)
        return tuple(a[:, 0] for a in tot)              # (wc, ...)

    # one traced chunk body, mapped over W/wc chunks (identical shapes)
    dchunks = digits.T.reshape(W // wc, wc, n)
    tots = jax.lax.map(chunk_body, dchunks)             # (W/wc, wc, ...)
    tot = tuple(a.reshape((W,) + a.shape[2:]) for a in tots)

    # Horner over the W real windows
    def win_body(i, R):
        R = jax.lax.fori_loop(0, c, lambda _, Sj: double_fn(f, Sj), R)
        Tw = tuple(a[W - 1 - i][None] for a in tot)
        return add_fn(f, R, Tw)

    R0 = tuple(match_vma(a, x) for a in jac_inf(f, (1,)))
    R = jax.lax.fori_loop(0, W, win_body, R0)
    return tuple(a[0] for a in R)


def msm_sorted(f, points, scalars, nbits: int, c: int | None = None,
               wc: int | None = None):
    """Sort-based MSM; same contract as pippenger.msm."""
    x, y, inf = points
    n = x.shape[0]
    n_class = 64
    while n_class < n:
        n_class *= 2
    if c is None:
        c, _ = _pick_params(n_class, nbits)
    if wc is None:
        # window-chunk: bound memory to ~wc * n points materialized
        wc = max(1, min(8, (1 << 24) // max(n_class, 1)))
    pad = n_class - n
    if pad:
        x = jnp.concatenate([x, jnp.broadcast_to(f.zeros(()), (pad,) + x.shape[1:])])
        y = jnp.concatenate([y, jnp.broadcast_to(f.zeros(()), (pad,) + y.shape[1:])])
        inf = jnp.concatenate([inf, jnp.ones((pad,), bool)])
        scalars = jnp.concatenate(
            [scalars, jnp.zeros((pad, scalars.shape[1]), scalars.dtype)])
    digits = window_digits(scalars, nbits, c)
    W = digits.shape[1]
    # pad W to a multiple of wc with zero-digit windows (contribute inf)
    padw = (-W) % wc
    if padw:
        digits = jnp.concatenate(
            [digits, jnp.zeros((digits.shape[0], padw), digits.dtype)], 1)
    return _msm_kernel_sorted(f, (x, y, inf), digits, nbits, c, wc)
