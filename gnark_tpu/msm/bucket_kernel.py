"""Pallas mega-kernel MSM: VMEM-resident buckets, no XLA gather/scatter.

This is the TPU-native answer to gnark-crypto's `MultiExp` hot path
(reference backend/groth16/bn254/prove.go:187-305, ~80% of prove time).
The round-1 scan kernel (pippenger.py) spent ~90% of its time in XLA's
row-at-a-time bucket scatter (~0.37us/row measured on v5e); this kernel
keeps every bucket in VMEM for the whole accumulation and replaces
gather/scatter with DENSE masked selects over the bucket axis — for
B = 128 buckets the mask work (~2*B*48 lane-ops per point-window pair)
costs about the same as the EC mixed-add itself, and everything is
static shapes + full-width VPU ops (no dynamic indexing).

Algorithm (signed-digit Pippenger):
  * scalars -> signed c-bit digits d in [-2^(c-1), 2^(c-1)], so only
    B = 2^(c-1) bucket magnitudes per window (sign flips y on the fly);
  * ONE pallas kernel streams points: each grid step DMAs 128 points;
    128/G unrolled substeps each perform one complete mixed add of
    width W*G (lane (w,g) owns a private bank of B buckets ->
    collision-free by construction); the bucket state (3, L, T, B)
    lives in the kernel OUTPUT block, which persists across the
    sequential TPU grid (reduce pattern);
  * XLA epilogue: fold the G group copies (pairwise tree), reduce each
    window's buckets with the work-efficient halving identity
      sum_{j=1..M} j*A_j = 2*sum_k k*(A_{2k-1}+A_{2k}) - sum_k A_{2k-1}
    (~2*W*B adds, geometric widths), then a Horner ladder over windows.

EC work: n*W mixed adds (the same op count as CPU Pippenger) plus
~5*W*B epilogue adds, all through the fused pallas group kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gnark_tpu.fields import FIELDS
from gnark_tpu.ff.mont import FF
from gnark_tpu.ff.pallas_mont import TFF
from gnark_tpu.ff.pallas_fp2 import TFF2
from gnark_tpu.ec.fp2 import FF2
from gnark_tpu.ec.pallas_ec import (_interpret, _proj_madd_t, proj_add_p,
                                    proj_double_p)
from gnark_tpu.ec.weierstrass import proj_to_jac
from gnark_tpu.msm.pippenger import _suffix_sums, window_digits
from gnark_tpu.utils.jaxutil import match_vma

import os

C_BITS = int(os.environ.get("GNARK_TPU_MSM_C", "8"))
BUCKETS = 1 << (C_BITS - 1)       # bucket magnitudes per window
_VMEM_CAP = 7 << 20               # bucket-state budget (bytes)


@functools.lru_cache(maxsize=None)
def curve_b3(field_name: str):
    """3*b mod p for the unique a=0 curve whose base field is
    `field_name`, or None. All device-MSM curves (the 4 pairing curves
    + grumpkin, reference doc.go:22-32) have a = 0, which is what makes
    the Renes-Costello complete formulas applicable."""
    from gnark_tpu.ec import curves
    for c in curves.CURVES.values():
        if c.fp.name == field_name:
            return 3 * c.b % c.fp.modulus
    return None


@functools.lru_cache(maxsize=None)
def curve_b3_g2(field_name: str):
    """3*b2 as an Fp2 pair for the curve whose G2 twist lives over
    Fp2 of `field_name` (the twists are a=0 too), or None."""
    from gnark_tpu.ec import curves
    for c in curves.CURVES.values():
        if c.fp.name == field_name and c.g2_over_fp2:
            p = c.fp.modulus
            return (3 * c.b2[0] % p, 3 * c.b2[1] % p)
    return None


@functools.lru_cache(maxsize=None)
def _tff_any(name: str, nr):
    """TFF for a prime field, TFF2 for Fp2 (nr = nonresidue)."""
    if nr is None:
        return TFF(FIELDS[name])
    return TFF2(TFF(FIELDS[name]), nr)


def _chunk(G: int) -> int:
    """Points DMA'd per grid step: 128 (lane-aligned) on TPU, where the
    kernel body unrolls 128/G substeps; G (one substep, small traced
    body) under the CPU interpreter, where compile time of the unrolled
    body dominates and DMA alignment is irrelevant."""
    return G if _interpret() else 128


def signed_digits(scalars, nbits: int, c: int):
    """(n, K) 16-bit limbs -> (W, n) int32 signed digits, |d| <= 2^(c-1).

    Borrow recoding: raw window t plus carry; when t >= 2^(c-1) emit
    t - 2^c and carry 1. An extra window absorbs the final carry only
    when the top raw window can actually overflow.
    """
    raw = window_digits(scalars, nbits, c)          # (n, W0) in [0, 2^c)
    n, W0 = raw.shape
    half = 1 << (c - 1)
    full = 1 << c
    top_bits = nbits - (W0 - 1) * c                 # bits in top window
    W = W0 + (1 if (1 << top_bits) >= half else 0)
    outs = []
    carry = jnp.zeros((n,), jnp.int32)
    for w in range(W):
        t = (raw[:, w] if w < W0 else jnp.zeros((n,), jnp.int32)) + carry
        hi = (t >= half).astype(jnp.int32)
        outs.append(t - hi * full)
        carry = hi
    return jnp.stack(outs, axis=0)                  # (W, n)


@functools.lru_cache(maxsize=None)
def _tff(name: str) -> TFF:
    return TFF(FIELDS[name])


def _geometry(W: int, L: int):
    """(G, T_pad): maximize add width under the bucket VMEM budget.
    T_pad rounds W*G up to the 128-lane tile; dead lanes are masked.

    The bucket-state footprint 3*L*B*T depends on T only — NOT on G —
    so when the budget rejects every G, fall back to the largest G
    whose W*G still fits in the minimal (G=1) lane width: those extra
    points ride in otherwise-dead lanes for free (same VMEM, G x fewer
    substeps). E.g. bn254 at GNARK_TPU_MSM_C=10 (W=26, L=16, B=512):
    the fallback picks (G=4, T=128) instead of (1, 128) — identical
    footprint, 4x the throughput. At the default C_BITS=8 the loop
    itself succeeds (bn254: G=8, T=256) and the fallback is unused."""
    g_env = os.environ.get("GNARK_TPU_MSM_G")
    if g_env:
        G = int(g_env)
        return G, -(-W * G // 128) * 128
    for G in (16, 8, 4, 2, 1):
        T = -(-W * G // 128) * 128
        if 3 * (L // 2) * T * BUCKETS * 4 <= _VMEM_CAP:
            return G, T
    T1 = -(-W // 128) * 128
    G = next(g for g in (16, 8, 4, 2, 1) if W * g <= T1)
    from gnark_tpu.logger import get_logger
    get_logger().debug(
        "msm bucket geometry over budget: W=%d L=%d B=%d -> (G=%d, T=%d)"
        " uses %d bytes of bucket state (soft cap %d); pallas_call may"
        " fail to compile if device VMEM is also exceeded",
        W, L, BUCKETS, G, T1, 3 * (L // 2) * T1 * BUCKETS * 4, _VMEM_CAP)
    return G, T1


def _lane_digits(digits, inf, G: int, T: int, ck: int):
    """(W, n) signed digits -> (steps*sub, T) per-lane digit rows.

    Lane t of substep row (i*sub + s) owns window w = t // G and point
    g = t % G of that substep's G points, i.e. point i*ck + s*G + g.
    Digits of infinity points are zeroed (lane skips). This runs in
    XLA (reshape/transpose are free there); Mosaic cannot reshape
    (L, W, G) -> (L, W*G) in-kernel, so the kernel gets flat rows."""
    W, n = digits.shape
    d = jnp.where(inf[None, :], 0, digits)
    sub = ck // G
    steps = n // ck
    d = d.reshape(W, steps, sub, G).transpose(1, 2, 0, 3)
    d = d.reshape(steps * sub, W * G)
    if T > W * G:
        d = jnp.pad(d, ((0, 0), (0, T - W * G)))
    return d


def _unpack_rows(p, L: int):
    """(L/2, T) packed u32 (limb 2i in the low half-word of row i,
    limb 2i+1 in the high half) -> (L, T) one-limb-per-row. Built from
    (1, T) row slices + one concatenate: Mosaic has no in-kernel
    sublane reshape/strided-slice."""
    lo = p & 0xFFFF
    hi = p >> 16
    rows = []
    for i in range(L // 2):
        rows.append(lo[i:i + 1])
        rows.append(hi[i:i + 1])
    return jnp.concatenate(rows, axis=0)


def _pack_rows(a, L: int):
    """(L, T) -> (L/2, T) packed u32 (inverse of _unpack_rows)."""
    lo = jnp.concatenate([a[2 * i:2 * i + 1] for i in range(L // 2)], 0)
    hi = jnp.concatenate([a[2 * i + 1:2 * i + 2] for i in range(L // 2)],
                         0)
    return lo | (hi << 16)


def _accumulate_kernel(f: TFF, W: int, G: int, L: int, T: int):
    """Bucket state is Renes-Costello PROJECTIVE (X : Y : Z), identity
    (0 : 1 : 0): the complete mixed add (ec/pallas_ec._proj_madd_t) is
    one branchless straight-line formula (11M + 2*mul-by-3b), vs the
    Jacobian complete add that paid a full doubling path + select
    chains on every substep (~1.45x the field work).

    The state stores limbs PACKED two-per-u32 word (3, L/2, B, T): the
    per-substep one-hot gather and masked writeback stream the whole
    state through the VPU, so halving its footprint halves the
    dominant non-EC cost (measured ~45% of kernel time unpacked)."""
    B = BUCKETS
    Lp = L // 2
    sub = _chunk(G) // G

    def kernel(pcol, onecol, p2col, b3col, ponecol, xT, yT, sd, bk):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            z = jnp.zeros((Lp, B, T), jnp.uint32)
            one = jnp.broadcast_to(ponecol[:][:, :, None], (Lp, B, T))
            bk[:] = jnp.stack([z, one, z], axis=0)

        fb = f.bind(pcol[:], onecol[:], p2col[:])
        b3c = b3col[:]
        # bucket index on the SUBLANE axis: mask (B, T) needs no
        # transpose (iota rows vs per-lane idx broadcast)
        iota_B = jax.lax.broadcasted_iota(jnp.int32, (B, T), 0)
        lane_g = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1) % G

        for s in range(sub):
            d = sd[s]                                 # (T,) int32
            mag = jnp.abs(d)
            valid = mag > 0                           # (T,)
            neg = d < 0
            idx = mag - 1                             # -1 on dead lanes

            # broadcast the substep's G points across their W lanes by
            # per-group lane selects (no in-kernel reshape)
            xb = jnp.zeros((L, T), xT.dtype)
            yb = jnp.zeros((L, T), yT.dtype)
            for g in range(G):
                selg = lane_g == g                    # (1, T)
                xb = jnp.where(selg, xT[:, s * G + g][:, None], xb)
                yb = jnp.where(selg, yT[:, s * G + g][:, None], yb)
            yb = jnp.where(neg[None, :], fb.neg2p(yb), yb)

            mask = (iota_B == idx[None, :]) & valid[None, :]   # (B, T)
            mu = mask.astype(jnp.int32)

            allb = bk[:]                              # (3, Lp, B, T)
            # one-hot masked sublane sum in int32 (one hit per lane,
            # bit pattern preserved — Mosaic has no unsigned sums)
            curp = (allb.astype(jnp.int32) * mu[None, None]).sum(
                axis=2).astype(jnp.uint32)            # (3, Lp, T)
            cur = tuple(_unpack_rows(curp[i], L) for i in range(3))

            # invalid lanes gather all-zeros (degenerate input) but are
            # never written back: mask is False across their B column
            new = _proj_madd_t(fb, cur, xb, yb, b3c)
            neww = jnp.stack([_pack_rows(a, L) for a in new], axis=0)

            if os.environ.get("GNARK_TPU_MSM_WB") == "maskstore":
                # predicated store: skips the select's second read
                # pass over the bucket state (experimental)
                pltpu.store(
                    bk,
                    jnp.broadcast_to(neww[:, :, None, :],
                                     (3, Lp, B, T)),
                    mask=jnp.broadcast_to(mask[None, None],
                                          (3, Lp, B, T)))
            else:
                bk[:] = jnp.where(mask[None, None], neww[:, :, None, :],
                                  allb)

        # NOTE: the state holds <= 2p representatives; the epilogue's
        # projective kernels accept those (their formulas run in the
        # same lazy class) and canonicalize their own outputs.

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 2))
def _msm_bucket_jit(ff: FF, arrs, nbits: int):
    """Whole MSM (padding + signed digits + kernel + epilogue) under
    ONE jit: the digit decomposition alone is ~35 ops, and over the
    axon tunnel every EAGER op is a ~0.3s dispatch — fusing the prep
    into the jit turned a 5-MSM Groth16 prove from minutes of
    dispatch latency into 5 device calls."""
    x, y, inf, scalars = arrs
    n = x.shape[0]
    n_pad = max(-(-n // 128) * 128, 128)
    pad = n_pad - n
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
        y = jnp.concatenate([y, jnp.zeros((pad,) + y.shape[1:], y.dtype)])
        inf = jnp.concatenate([inf, jnp.ones((pad,), bool)])
        scalars = jnp.concatenate(
            [scalars, jnp.zeros((pad, scalars.shape[1]), scalars.dtype)])
    digits = signed_digits(scalars, nbits, C_BITS)
    return _msm_device(ff, (x, y, inf), digits, digits.shape[0])


def _msm_device(ff, points, digits, W: int):
    """points: (x, y, inf) with n a multiple of CHUNK; digits (W, n);
    ff: FF (G1) or FF2 (G2 — coordinates flattened to (n, 2L) rows,
    c0 limbs then c1, matching ff/pallas_fp2.TFF2's stacked layout).

    Returns a JACOBIAN point (the public contract); internally the
    bucket state and the whole epilogue are Renes-Costello projective
    with identity (0 : 1 : 0), converted at the very end."""
    is_fp2 = isinstance(ff, FF2)
    if is_fp2:
        f = _tff_any(ff.p.name, ff._nr_small)
        b3 = curve_b3_g2(ff.p.name)
        L = 2 * ff.n                     # stacked c0|c1 limb rows
    else:
        f = _tff_any(ff.p.name, None)
        b3 = curve_b3(ff.p.name)
        L = ff.n
    if b3 is None:
        raise ValueError(
            f"no a=0 curve registered for base field {ff.p.name}; "
            "use msm/pippenger.msm (Jacobian scan path) instead")
    B = BUCKETS
    G, T = _geometry(W, L)
    x, y, inf = points
    if is_fp2:                           # (n, 2, Lb) -> (n, 2*Lb)
        x = x.reshape(x.shape[0], L)
        y = y.reshape(y.shape[0], L)
    n = x.shape[0]
    ck = _chunk(G)
    steps = n // ck
    sub = ck // G
    sd = _lane_digits(digits, inf, G, T, ck)

    if L % 2:
        raise ValueError(f"odd limb count {L} unsupported (packed state)")
    Lp = L // 2
    pcol, onecol, p2col = f.consts3()
    b3col = f.mont_col2(*b3) if is_fp2 else f.mont_col(b3)
    pone = (onecol[0::2] | (onecol[1::2].astype(np.uint32) << 16))

    cspec = pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec((Lp, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    bk = pl.pallas_call(
        _accumulate_kernel(f, W, G, L, T),
        out_shape=jax.ShapeDtypeStruct((3, Lp, B, T), jnp.uint32),
        grid=(steps,),
        in_specs=[cspec, cspec, cspec, cspec, pspec,
                  pl.BlockSpec((L, ck), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((L, ck), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((sub, T), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((3, Lp, B, T), lambda i: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(pcol, onecol, p2col, b3col, pone, x.T, y.T, sd)

    # unpack half-words (XLA-side: reshapes are free here), then
    # lanes -> (W, G, B, L) standard layout, drop dead lanes
    def _unpack_xla(p):                               # (Lp, B, T)
        return jnp.stack([p & 0xFFFF, p >> 16], axis=1).reshape(L, B, T)

    coords = tuple(
        jnp.transpose(_unpack_xla(bk[i]), (2, 1, 0))[: W * G]
        .reshape(W, G, B, L) for i in range(3))

    def add_fn(f_, S, Q):
        return proj_add_p(f_, b3, S, Q)

    # projective identity (0 : 1 : 0) fill for out-of-range shifts
    one_flat = (np.concatenate([ff.base.one_np,
                                np.zeros_like(ff.base.one_np)])
                if is_fp2 else ff.one_np)
    ident = (jnp.zeros((), jnp.uint32), jnp.asarray(one_flat),
             jnp.zeros((), jnp.uint32))

    # fold group copies (suffix over G, take slot 0) — O(1) add-graph
    # instantiations per reduction (see pippenger._suffix_sums note)
    P = _suffix_sums(ff, coords, G, axis=1, add_fn=add_fn,
                     identity=ident)
    P = tuple(a[:, 0] for a in P)                     # (W, B, L)

    # weighted bucket reduction: magnitude of bucket i is i+1, so
    # sum_i (i+1)*P_i = double suffix-sum over ALL B buckets
    suf = _suffix_sums(ff, P, B, axis=1, add_fn=add_fn, identity=ident)
    tot = _suffix_sums(ff, suf, B, axis=1, add_fn=add_fn, identity=ident)
    tot = tuple(a[:, 0] for a in tot)                 # (W, L)

    # Horner over windows, top-down: R = 2^c * R + T_w
    def win_body(i, R):
        R = jax.lax.fori_loop(
            0, C_BITS, lambda _, S: proj_double_p(ff, b3, S), R)
        Tw = tuple(a[W - 1 - i][None] for a in tot)
        return proj_add_p(ff, b3, R, Tw)

    R0 = (jnp.zeros((1, L), jnp.uint32),
          jnp.broadcast_to(jnp.asarray(one_flat), (1, L)),
          jnp.zeros((1, L), jnp.uint32))
    R0 = tuple(match_vma(a, x) for a in R0)
    R = jax.lax.fori_loop(0, W, win_body, R0)
    if is_fp2:                           # back to FF2 layout (1, 2, Lb)
        R = tuple(a.reshape(1, 2, ff.n) for a in R)
    R = proj_to_jac(ff, R)
    return tuple(a[0] for a in R)


def msm_bucket(ff: FF, points, scalars, nbits: int):
    """MSM via the VMEM bucket kernel; same contract as pippenger.msm
    (points (x, y, inf) leading dim n, scalars (n, K) plain limbs)."""
    x, y, inf = points
    return _msm_bucket_jit(ff, (x, y, inf, scalars), nbits)


def msm_bucket_chunked(ff: FF, points, scalars, nbits: int,
                       chunk: int | None = None):
    """MSM for point sets beyond the device memory budget: stream
    fixed-size chunks through msm_bucket and fold the per-chunk
    Jacobian partials (the ICICLE chunked-MSM pattern,
    backend/accelerated/icicle/groth16/bn254/icicle.go:555-782 —
    chunk count from free device memory; here a fixed 2^20-point
    default, env GNARK_TPU_MSM_CHUNK overrides, mirroring
    ICICLE_MSM_CHUNK_CAP).

    When n is a multiple of the chunk size the chunk loop is a
    lax.scan — ONE traced kernel instance regardless of chunk count,
    so 2^22+ MSMs compile in the same time as one 2^20 chunk."""
    if chunk is None:
        chunk = int(os.environ.get("GNARK_TPU_MSM_CHUNK", str(1 << 20)))
    x, y, inf = points
    n = x.shape[0]
    if n <= chunk:
        return msm_bucket(ff, points, scalars, nbits)
    from gnark_tpu.ec.weierstrass import jac_add, jac_inf
    if n % chunk == 0:
        C = n // chunk
        xs = (x.reshape((C, chunk) + x.shape[1:]),
              y.reshape((C, chunk) + y.shape[1:]),
              inf.reshape(C, chunk),
              scalars.reshape(C, chunk, scalars.shape[1]))

        def body(carry, cx):
            cxx, cyy, cinf, csc = cx
            part = _msm_bucket_jit(ff, (cxx, cyy, cinf, csc), nbits)
            return jac_add(ff, carry, part), None

        init = tuple(a[0] for a in jac_inf(ff, (1,)))
        init = tuple(match_vma(a, x) for a in init)
        acc, _ = jax.lax.scan(body, init, xs)
        return acc
    acc = None
    for off in range(0, n, chunk):
        end = min(off + chunk, n)
        part = msm_bucket(
            ff, (x[off:end], y[off:end], inf[off:end]),
            scalars[off:end], nbits)
        acc = part if acc is None else jac_add(ff, acc, part)
    return acc
