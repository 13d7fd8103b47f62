"""Ablation of the MSM bucket kernel: which part of a substep costs?

Variants (same grid/IO, pieces removed):
  full     gather + RC madd + masked writeback  (the real kernel)
  noec     gather + writeback of gathered value (no field math)
  nogather RC madd on a constant + writeback    (no one-hot sum)
  nowrite  gather + RC madd, tiny xor-accum output (no state write)
  empty    touch inputs only (loop/DMA floor)

Usage: python tools/msm_kernel_ablate.py [mode ...]
"""
import sys; sys.path.insert(0, "/root/repo")  # noqa: E702
import functools
import json
import os
import time

import numpy as np

os.makedirs("/root/.cache/gnark_tpu_xla_tpu", exist_ok=True)
import jax  # noqa: E402
from gnark_tpu.utils.cachekey import setup_cache; setup_cache()
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from gnark_tpu.ec import curves, host  # noqa: E402
from gnark_tpu.ec.pallas_ec import _proj_madd_t  # noqa: E402
from gnark_tpu.ff import get_ff  # noqa: E402
from gnark_tpu.msm import bucket_kernel as bk  # noqa: E402

n = 1 << 16
curve = curves.CURVES["bn254"]
ffp = get_ff(curve.fp.name)
ffr = get_ff(curve.fr.name)
pool = 64
f1 = curve.host_fp
pts, cur0 = [], curve.g1
for _ in range(pool):
    pts.append(cur0)
    cur0 = host.ec_dbl(f1, cur0)
reps = n // pool
x = jnp.asarray(np.tile(ffp.encode([p[0] for p in pts]), (reps, 1)))
y = jnp.asarray(np.tile(ffp.encode([p[1] for p in pts]), (reps, 1)))
inf = jnp.zeros((n,), bool)
rng = np.random.RandomState(7)
ks = [int.from_bytes(rng.bytes(31), "little") % curve.fr.modulus
      for _ in range(n)]
scalars = jnp.asarray(ffr.encode(ks, mont=False))
nbits = curve.fr.bits


def make_kernel(f, W, G, L, T, b3, mode):
    B = bk.BUCKETS
    Lp = L // 2
    sub = bk._chunk(G) // G

    def kernel(pcol, onecol, ponecol, xT, yT, sd, bkref, accref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            z = jnp.zeros((Lp, B, T), jnp.uint32)
            one = jnp.broadcast_to(ponecol[:][:, :, None], (Lp, B, T))
            bkref[:] = jnp.stack([z, one, z], axis=0)
            accref[:] = jnp.zeros_like(accref)

        fb = f.bind(pcol[:], onecol[:])
        iota_B = jax.lax.broadcasted_iota(jnp.int32, (B, T), 0)
        lane_g = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1) % G

        for s in range(sub):
            d = sd[s]
            mag = jnp.abs(d)
            valid = mag > 0
            neg = d < 0
            idx = mag - 1
            xb = jnp.zeros((L, T), xT.dtype)
            yb = jnp.zeros((L, T), yT.dtype)
            for g in range(G):
                selg = lane_g == g
                xb = jnp.where(selg, xT[:, s * G + g][:, None], xb)
                yb = jnp.where(selg, yT[:, s * G + g][:, None], yb)
            yb = jnp.where(neg[None, :], fb.neg(yb), yb)
            mask = (iota_B == idx[None, :]) & valid[None, :]
            mu = mask.astype(jnp.int32)

            if mode == "empty":
                accref[:] = accref[:] ^ (xb[:1] ^ yb[:1]
                                         ^ mu[:1].astype(jnp.uint32))
                continue

            if mode == "nogather":
                cur = (jnp.broadcast_to(onecol[:], (L, T)),
                       jnp.broadcast_to(onecol[:], (L, T)),
                       jnp.broadcast_to(onecol[:], (L, T)))
            else:
                allb = bkref[:]
                curp = (allb.astype(jnp.int32) * mu[None, None]).sum(
                    axis=2).astype(jnp.uint32)
                cur = tuple(bk._unpack_rows(curp[i], L) for i in range(3))

            if mode == "noec":
                new = cur
            else:
                new = _proj_madd_t(fb, cur, xb, yb, b3)

            if mode == "nowrite":
                accref[:] = accref[:] ^ new[0][:1] ^ new[1][:1] ^ new[2][:1]
            else:
                neww = jnp.stack([bk._pack_rows(a, L) for a in new], 0)
                if mode == "nogather":
                    bkref[:] = jnp.where(mask[None, None],
                                         neww[:, :, None, :],
                                         jnp.zeros((), jnp.uint32))
                else:
                    bkref[:] = jnp.where(mask[None, None],
                                         neww[:, :, None, :], allb)

    return kernel


@functools.partial(jax.jit, static_argnums=(0,))
def run(mode, points, digits):
    W = digits.shape[0]
    f = bk._tff(ffp.p.name)
    L = ffp.n
    Lp = L // 2
    B = bk.BUCKETS
    G, T = bk._geometry(W, L)
    xx, yy, ii = points
    ck = bk._chunk(G)
    steps = xx.shape[0] // ck
    sub = ck // G
    sd = bk._lane_digits(digits, ii, G, T, ck)
    pcol, onecol = f.consts()
    pone = (onecol[0::2] | (onecol[1::2].astype(np.uint32) << 16))
    cspec = pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec((Lp, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        make_kernel(f, W, G, L, T, bk.curve_b3(ffp.p.name), mode),
        out_shape=[jax.ShapeDtypeStruct((3, Lp, B, T), jnp.uint32),
                   jax.ShapeDtypeStruct((1, T), jnp.uint32)],
        grid=(steps,),
        in_specs=[cspec, cspec, pspec,
                  pl.BlockSpec((L, ck), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((L, ck), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((sub, T), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((3, Lp, B, T), lambda i: (0, 0, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, T), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)],
        interpret=False,
    )(pcol, onecol, pone, xx.T, yy.T, sd)
    return out[0].sum(dtype=jnp.uint32) ^ out[1].sum(dtype=jnp.uint32)


digits = bk.signed_digits(scalars, nbits, bk.C_BITS)

modes = sys.argv[1:] or ["empty", "noec", "nogather", "nowrite", "full"]
for mode in modes:
    def chain(K):
        @jax.jit
        def fjit(s):
            def body(i, carry):
                s_, acc = carry
                dd = bk.signed_digits(s_, nbits, bk.C_BITS)
                r = run(mode, (x, y, inf), dd)
                return (jnp.roll(s_, 1, axis=0), acc ^ r)
            _, acc = jax.lax.fori_loop(0, K, body, (s, jnp.uint32(0)))
            return acc
        return fjit

    times = {}
    for K in (1, 3):
        fj = chain(K)
        _ = np.asarray(fj(scalars))
        best = float("inf")
        for _i in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(fj(scalars))
            best = min(best, time.perf_counter() - t0)
        times[K] = best
    print(json.dumps({"mode": mode,
                      "slope_ms": round((times[3] - times[1]) / 2 * 1e3, 2)}),
          flush=True)
