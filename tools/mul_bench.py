"""Micro-benchmark of the in-kernel Montgomery mul (TFF.mul).

Chains KMULS dependent muls over a (L, T) block inside one pallas
kernel, grid of GRID steps -> muls/s and cycles/mul. Compares carry
strategies. Usage: python tools/mul_bench.py [variant ...]
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

from gnark_tpu.ff import get_ff  # noqa: E402
from gnark_tpu.ff.pallas_mont import TFF  # noqa: E402
from gnark_tpu.fields import FIELDS  # noqa: E402

T = 512
KMULS = 64

ffp = get_ff("bn254_fp")
f = TFF(FIELDS["bn254_fp"])
L = ffp.n
rng = np.random.RandomState(0)
q = ffp.p.modulus
a_vals = [rng.randint(0, 1 << 60) for _ in range(T)]
b_vals = [rng.randint(0, 1 << 60) for _ in range(T)]
a = jnp.asarray(np.ascontiguousarray(ffp.encode(a_vals).T))  # (L, T)
b = jnp.asarray(np.ascontiguousarray(ffp.encode(b_vals).T))


def run(variant, GRID):
    from gnark_tpu.ec.pallas_ec import _proj_madd_t

    def madd(fb, x, y):
        b3c = jnp.broadcast_to(jnp.asarray(f.mont_col(9)), (L, 1))
        X, Y, Z = _proj_madd_t(fb, (x, y, x), y, x, b3c)
        return fb.mul(fb.canon(X), fb.mul(fb.canon(Y), fb.canon(Z)))

    mulfn = {
        "base": lambda fb, x, y: fb.mul(x, y),
        "add": lambda fb, x, y: fb.add(x, y),
        "sub": lambda fb, x, y: fb.sub(x, y),
        "madd": madd,
        "mul9": lambda fb, x, y: fb.mul_small(fb.mul(x, y), 9),
        "mul_lazy": lambda fb, x, y: fb.canon(fb.mul_lazy(x, y)),
        "add2p": lambda fb, x, y: fb.add2p(x, y),
        "sub2p": lambda fb, x, y: fb.sub2p(x, y),
        "sop2": lambda fb, x, y: fb.sop2(x, y, x, y),
    }[variant]

    def kernel(pcol, onecol, p2col, xr, yr, out):
        fb = f.bind(pcol[:], onecol[:], p2col[:])
        x = xr[:]
        y = yr[:]

        def body(i, x):
            return mulfn(fb, x, y)
        x = jax.lax.fori_loop(0, KMULS, body, x)
        out[:] = x

    cspec = pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    spec = pl.BlockSpec((L, T), lambda i: (0, 0), memory_space=pltpu.VMEM)

    @jax.jit
    def go(xx, yy):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((L, T), jnp.uint32),
            grid=(GRID,),
            in_specs=[cspec, cspec, cspec, spec, spec],
            out_specs=spec,
            interpret=False,
        )(*f.consts3(), xx, yy)

    r = go(a, b)
    ref = np.asarray(r)
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        _ = np.asarray(go(a, b))
        best = min(best, time.perf_counter() - t0)
    nmul = KMULS * GRID * T
    # subtract nothing: dispatch overhead ~0.1s dominates? report both
    return ref, best, nmul


# correctness oracle from host ints
def check(ref):
    av = [int(x) for x in ffp.decode(np.asarray(a.T), mont=True)]
    bv = [int(x) for x in ffp.decode(np.asarray(b.T), mont=True)]
    got = [int(x) for x in ffp.decode(ref.T, mont=True)]
    ok = True
    for i in range(4):
        want = av[i]
        for _ in range(KMULS):
            want = want * bv[i] % q
        ok &= (got[i] == want)
    return ok


variants = sys.argv[1:] or ["base"]
for v in variants:
    ref, t_lo, _ = run(v, 128)
    _, t_hi, _ = run(v, 1152)
    per_grid = (t_hi - t_lo) / 1024          # one grid step = KMULS muls of (L,T)
    per_mul = per_grid / KMULS
    print(json.dumps({
        "variant": v, "ok": check(ref) if v == "base" else None,
        "us_per_fullwidth_mul": round(per_mul * 1e6, 3),
        "cycles_per_mul_est": round(per_mul * 0.94e9, 0),
        "ns_per_mul_lane": round(per_mul / T * 1e9, 3)}), flush=True)
