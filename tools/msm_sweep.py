import sys; sys.path.insert(0, "/root/repo")
import os, sys, time, json
import numpy as np

c = int(sys.argv[1])
os.environ["GNARK_TPU_MSM_C"] = str(c)
os.makedirs("/root/.cache/gnark_tpu_xla_tpu", exist_ok=True)
import jax
from gnark_tpu.utils.cachekey import setup_cache; setup_cache()
import jax.numpy as jnp
from gnark_tpu.ec import curves, host
from gnark_tpu.ff import get_ff
from gnark_tpu.msm import bucket_kernel as bk

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

def chain(K):
    @jax.jit
    def f(xa, ya, infa, s):
        def body(i, carry):
            s_, acc = carry
            r = bk.msm_bucket(ffp, (xa, ya, infa), s_, nbits)
            s2 = jnp.roll(s_, 1, axis=0)
            acc = tuple(a ^ b for a, b in zip(acc, r))
            return (s2, acc)
        z = tuple(jnp.zeros((xa.shape[1],), jnp.uint32) for _ in range(3))
        _, acc = jax.lax.fori_loop(0, K, body, (s, z))
        return acc
    return f

t_compile0 = time.time()
times = {}
for K in (1, 3):
    f = chain(K)
    r = f(x, y, inf, scalars)
    _ = tuple(np.asarray(a) for a in r)
    best = float("inf")
    for _i in range(3):
        t0 = time.perf_counter()
        r = f(x, y, inf, scalars)
        _ = tuple(np.asarray(a) for a in r)
        best = min(best, time.perf_counter() - t0)
    times[K] = best
per = (times[3] - times[1]) / 2
print(json.dumps({"c": c, "per_msm_s": round(per, 4),
                  "pps": round(n / per), "compile_s": round(time.time()-t_compile0, 1)}))
