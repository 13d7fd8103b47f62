import sys; sys.path.insert(0, "/root/repo")
import os, time, json
import numpy as np
os.makedirs("/root/.cache/gnark_tpu_xla_tpu", exist_ok=True)
import jax
from gnark_tpu.utils.cachekey import setup_cache; setup_cache()
import jax.numpy as jnp
from gnark_tpu.ec import curves, host
from gnark_tpu.ff import get_ff
from gnark_tpu.msm import bucket_kernel as bk
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import functools

n = 1 << 16
curve = curves.CURVES["bn254"]
ffp = get_ff(curve.fp.name); ffr = get_ff(curve.fr.name)
pool = 64
f1 = curve.host_fp
pts, cur = [], curve.g1
for _ in range(pool):
    pts.append(cur); cur = host.ec_dbl(f1, cur)
xs = ffp.encode([p[0] for p in pts]); ys = ffp.encode([p[1] for p in pts])
reps = n // pool
x = jnp.asarray(np.tile(xs, (reps, 1))); y = jnp.asarray(np.tile(ys, (reps, 1)))
inf = jnp.zeros((n,), bool)
rng = np.random.RandomState(7)
ks = [int.from_bytes(rng.bytes(31), "little") % curve.fr.modulus for _ in range(n)]
scalars = jnp.asarray(ffr.encode(ks, mont=False))
nbits = curve.fr.bits

# kernel-only probe: accumulate buckets, return a reduced checksum
@functools.partial(jax.jit, static_argnums=(0, 3))
def kernel_only(ff, points, digits, W):
    f = bk._tff(ff.p.name)
    L = ff.n
    B = bk.BUCKETS
    G, T = bk._geometry(W, L)
    x, y, inf = points
    nn = x.shape[0]
    ck = bk._chunk(G)
    steps = nn // ck
    sub = ck // G
    sd = bk._lane_digits(digits, inf, G, T, ck)
    Lp = L // 2
    pcol, onecol, p2col = f.consts3()
    pone = (onecol[0::2] | (onecol[1::2].astype(np.uint32) << 16))
    cspec = pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec((Lp, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    bkout = pl.pallas_call(
        bk._accumulate_kernel(f, W, G, L, T),
        out_shape=jax.ShapeDtypeStruct((3, Lp, B, T), jnp.uint32),
        grid=(steps,),
        in_specs=[cspec, cspec, cspec, cspec, pspec,
                  pl.BlockSpec((L, ck), lambda i: (0, i), memory_space=pltpu.VMEM),
                  pl.BlockSpec((L, ck), lambda i: (0, i), memory_space=pltpu.VMEM),
                  pl.BlockSpec((sub, T), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((3, Lp, B, T), lambda i: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=False,
    )(pcol, onecol, p2col, f.mont_col(bk.curve_b3(ff.p.name)), pone, x.T, y.T, sd)
    return bkout.sum(dtype=jnp.uint32)

digits = bk.signed_digits(scalars, nbits, bk.C_BITS)
W = digits.shape[0]

def timeit(fn, *args):
    r = fn(*args); _ = np.asarray(r)
    best = float("inf")
    for _i in range(5):
        t0 = time.perf_counter()
        r = fn(*args); _ = np.asarray(r)
        best = min(best, time.perf_counter() - t0)
    return best

tk = timeit(kernel_only, ffp, (x, y, inf), digits, W)
tfull = timeit(functools.partial(bk._msm_device, ffp), (x, y, inf), digits, W)
print(json.dumps({"c": bk.C_BITS, "kernel_only_s": round(tk, 4),
                  "full_s": round(tfull, 4)}))
