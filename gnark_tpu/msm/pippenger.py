"""Multi-scalar multiplication (Pippenger) on TPU.

TPU-native replacement for gnark-crypto's `MultiExp` (the #1 hot op in
Groth16/PLONK proving — reference call sites:
backend/groth16/bn254/prove.go:194,207,227,237,283; ~80% of prove time,
SURVEY.md §3.2). Works generically over G1 (f = FF) and G2 (f = FF2).

Strategy (SURVEY.md §7 step 3, "bucket accumulation without scatter"
relaxed to *collision-free* scatter):

  * scalars are sliced into W windows of c bits (digits on device);
  * points are split into G independent groups; a `lax.scan` walks the
    n/G points of every (window, group) pair simultaneously, each step
    doing ONE batched complete mixed-add of width W*G into a flat
    bucket array — the scatter indices within a step are distinct by
    construction (each (w, g) owns a disjoint bucket range), so the
    update is collision-free and XLA-legal;
  * groups fold with a log2(G) tree of batched Jacobian adds;
  * per-window bucket reduction sum_j j*B_j is a *reverse associative
    scan* (suffix sums) + tree reduction — O(c) depth, fully batched;
  * windows combine with the classic c-doublings Horner ladder.

Total EC work: n*W mixed adds (same op count as CPU Pippenger) +
O(2^c * (log G + c)) batched adds of width W*2^c.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gnark_tpu import config
from gnark_tpu.fields import LIMB_BITS
from gnark_tpu.utils.jaxutil import match_vma
from gnark_tpu.ec.weierstrass import (
    jac_add, jac_add_mixed, jac_double, jac_inf, jac_select,
)


def _group_ops(f):
    """(add, add_mixed, double) — fused Pallas kernels for base-field
    groups on TPU (an order of magnitude faster than the portable scan
    path; see ec/pallas_ec.py), portable jnp ops otherwise/for Fp2."""
    from gnark_tpu.ff.mont import FF
    if config.use_pallas() and isinstance(f, FF):
        from gnark_tpu.ec import pallas_ec
        return (pallas_ec.jac_add_p, pallas_ec.jac_add_mixed_p,
                pallas_ec.jac_double_p)
    return jac_add, jac_add_mixed, jac_double


def window_digits(scalars, nbits: int, c: int):
    """(n, K) uint32 16-bit scalar limbs -> (n, W) int32 c-bit digits."""
    n, K = scalars.shape
    W = -(-nbits // c)
    padded = jnp.concatenate(
        [scalars, jnp.zeros((n, 1), scalars.dtype)], axis=1)
    cols = []
    mask = np.uint32((1 << c) - 1)
    for w in range(W):
        bit0 = w * c
        lo, sh = divmod(bit0, LIMB_BITS)
        v = padded[:, lo] >> np.uint32(sh)
        if sh + c > LIMB_BITS:
            v = v | (padded[:, lo + 1] << np.uint32(LIMB_BITS - sh))
        cols.append(v & mask)
    return jnp.stack(cols, axis=1).astype(jnp.int32)


def _suffix_sums(f, P, m: int, axis: int, add_fn=jac_add, identity=None):
    """Log-depth suffix sums over axis of length m with EC adds.

    Hillis-Steele over a fori_loop: S_i <- S_i + S_{i+2^k}, shifted
    elements beyond the end masked to the group identity. ONE jac_add
    instantiation in the graph regardless of m (compile-time critical:
    tree folds / associative_scan instantiate the 4k-op complete-add
    graph log(m) times and made MSM compiles take minutes).
    Returns a pytree shaped like P where index i along `axis` holds
    sum_{j >= i} P_j.

    identity: per-coordinate fill values for out-of-range entries
    (broadcastable against a trailing limb dim). Default None = all
    zeros, the Jacobian infinity (Z=0). Renes-Costello projective
    callers MUST pass (0, one, 0): the all-zero triple is degenerate
    there (it absorbs: P + (0,0,0) = (0,0,0)).
    """
    steps = max(m - 1, 0).bit_length()
    idx = jnp.arange(m, dtype=jnp.int32)
    if identity is None:
        identity = tuple(jnp.zeros((), a.dtype) for a in P)

    def body(k, S):
        sh = jnp.int32(1) << k
        def shift(a, fill):
            rolled = jnp.roll(a, -sh, axis=axis)
            shape = [1] * a.ndim
            shape[axis] = m
            valid = ((idx + sh) < m).reshape(shape)
            return jnp.where(valid, rolled, fill)
        shifted = tuple(shift(a, fl) for a, fl in zip(S, identity))
        if add_fn is not jac_add:
            # pallas kernels take one flat batch dim: (n, L)
            shp = S[0].shape
            Sf = tuple(a.reshape(-1, a.shape[-1]) for a in S)
            Tf = tuple(a.reshape(-1, a.shape[-1]) for a in shifted)
            R = add_fn(f, Sf, Tf)
            return tuple(a.reshape(shp) for a in R)
        return add_fn(f, S, shifted)

    return jax.lax.fori_loop(0, steps, body, P)


def _pick_params(n: int, nbits: int):
    """(c, G) heuristics.

    c balances scan work n*W against bucket count W*2^c; G (number of
    parallel point groups per window) is capped at n/2^c so the
    group-fold overhead W*2^c*log(G) stays below the useful n*W adds.
    n is a power of two (msm() pads), so G is too.
    """
    if n <= 256:
        c = 4
    elif n <= 1 << 12:
        c = 8
    elif n <= 1 << 16:
        c = 11
    elif n <= 1 << 20:
        c = 13
    else:
        c = 15
    G = max(1, min(4096, n >> c))
    return c, G


@functools.partial(jax.jit, static_argnums=(0, 3, 4, 5))
def _msm_kernel(f, points, digits, nbits: int, c: int, G: int):
    add_fn, add_mixed_fn, double_fn = _group_ops(f)
    x, y, inf = points
    n = x.shape[0]
    W = digits.shape[1]
    B = 1 << c
    steps = n // G

    # scatter index per (step, w, g): (w*G + g)*B + digit
    d = digits.reshape(G, steps, W).transpose(1, 2, 0)       # (steps, W, G)
    wg_base = (jnp.arange(W * G, dtype=jnp.int32) * B).reshape(W, G)
    idx = (d + wg_base[None]).reshape(steps, W * G)

    # per-step affine points, grouped: (steps, G, ...)
    def grp(a):
        return a.reshape((G, steps) + a.shape[1:]).swapaxes(0, 1)

    xs = (idx, grp(x), grp(y), grp(inf))

    # pack X|Y|Z along the last axis so the per-step bucket access is
    # ONE gather + ONE scatter (row DMAs dominate the scan cost)
    inf0 = tuple(match_vma(a, x) for a in jac_inf(f, (W * G * B,)))
    flat_dims = inf0[0].ndim - 1
    def pack(t):
        return jnp.concatenate(
            [a.reshape(a.shape[0], -1) for a in t], axis=-1)
    coord_sz = inf0[0].reshape(inf0[0].shape[0], -1).shape[-1]
    coord_shape = inf0[0].shape[1:]
    buckets = pack(inf0)

    def unpack(p, lead):
        return tuple(
            p[..., i * coord_sz:(i + 1) * coord_sz].reshape(
                lead + coord_shape) for i in range(3))

    def body(bk, step):
        ix, px, py, pinf = step
        cur = unpack(bk[ix], (W * G,))
        # broadcast the G points across W windows -> width W*G
        tile = lambda a: jnp.broadcast_to(
            a[None], (W,) + a.shape).reshape((W * G,) + a.shape[1:])
        new = add_mixed_fn(f, cur, (tile(px), tile(py), tile(pinf)))
        bk = bk.at[ix].set(pack(new))
        return bk, None

    buckets, _ = jax.lax.scan(body, buckets, xs)
    buckets = unpack(buckets, (W * G * B,))

    # fold groups: (W, G, B, ...) -> (W, B, ...) (suffix over G, take 0)
    bk = tuple(a.reshape((W, G, B) + a.shape[1:]) for a in buckets)
    bk = _suffix_sums(f, bk, G, axis=1, add_fn=add_fn)
    bk = tuple(a[:, 0] for a in bk)       # (W, B, ...)

    # per window: sum_j j*B_j = sum of suffix sums of buckets 1..B-1
    tail = tuple(a[:, 1:] for a in bk)    # (W, B-1, ...)
    suf = _suffix_sums(f, tail, B - 1, axis=1, add_fn=add_fn)
    tot = _suffix_sums(f, suf, B - 1, axis=1, add_fn=add_fn)
    tot = tuple(a[:, 0] for a in tot)     # (W, ...) per-window sums

    # Horner over windows: R = 2^c * R + T_w, from the top window down.
    # fori_loops keep the graph at one double + one add instantiation.
    def win_body(i, R):
        R = jax.lax.fori_loop(0, c, lambda _, S: double_fn(f, S), R)
        Tw = tuple(a[W - 1 - i][None] for a in tot)
        return add_fn(f, R, Tw)

    R0 = tuple(match_vma(a, x) for a in jac_inf(f, (1,)))
    R = jax.lax.fori_loop(0, W, win_body, R0)
    return tuple(a[0] for a in R)


def msm(f, points, scalars, nbits: int, c: int | None = None,
        groups: int | None = None):
    """MSM: sum_i scalars[i] * points[i].

    points:  (x, y, inf) affine arrays, leading dim n
    scalars: (n, K) uint32 16-bit limbs of PLAIN (non-Montgomery) scalars
    nbits:   scalar bit width (fr.bits)
    Returns a Jacobian point (batch shape ()).
    """
    # Route through the VMEM-bucket mega-kernel on real TPU hardware
    # (10x the scan path at 2^16); the scan kernel remains the
    # portable/CPU-interpreter and Fp2 (G2) path.
    from gnark_tpu import config
    from gnark_tpu.fields import FIELDS
    impl = config.msm_impl()
    want_bucket = impl == "bucket" or (
        impl == "auto" and jax.devices()[0].platform != "cpu")
    fname = getattr(getattr(f, "p", None), "name", None)
    if want_bucket and fname in FIELDS:
        from gnark_tpu.msm.bucket_kernel import (curve_b3, curve_b3_g2,
                                                 msm_bucket_chunked)
        if points[0].ndim == 2 and curve_b3(fname) is not None:
            return msm_bucket_chunked(f, points, scalars, nbits)  # G1
        if (points[0].ndim == 3 and curve_b3_g2(fname) is not None
                and getattr(f, "_nr_small", None) is not None):
            return msm_bucket_chunked(f, points, scalars,
                                      nbits)                # G2 / Fp2
    x, y, inf = points
    n = x.shape[0]
    # round the size up to a power-of-two class (>= 64) so repeated
    # MSMs of nearby sizes share one compiled kernel
    n_class = 64
    while n_class < n:
        n_class *= 2
    if c is None or groups is None:
        c_auto, g_auto = _pick_params(n_class, nbits)
        c = c or c_auto
        groups = groups or g_auto
    G = min(groups, n_class)
    return _msm_scan_jit(f, (x, y, inf, scalars), nbits, c, G, n_class)


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4, 5))
def _msm_scan_jit(f, arrs, nbits: int, c: int, G: int, n_class: int):
    """Padding + digit decomposition + scan kernel under ONE jit (each
    eager op over the axon tunnel is a ~0.3s dispatch)."""
    x, y, inf, scalars = arrs
    pad = n_class - x.shape[0]
    if pad:
        x = jnp.concatenate([x, jnp.broadcast_to(f.zeros(()), (pad,) + x.shape[1:])])
        y = jnp.concatenate([y, jnp.broadcast_to(f.zeros(()), (pad,) + y.shape[1:])])
        inf = jnp.concatenate([inf, jnp.ones((pad,), bool)])
        scalars = jnp.concatenate(
            [scalars, jnp.zeros((pad, scalars.shape[1]), scalars.dtype)])
    digits = window_digits(scalars, nbits, c)
    return _msm_kernel(f, (x, y, inf), digits, nbits, c, G)
