import sys; sys.path.insert(0, "/root/repo")
import os, time, json
import numpy as np
os.makedirs("/root/.cache/gnark_tpu_xla_tpu", exist_ok=True)
import jax
from gnark_tpu.utils.cachekey import setup_cache; setup_cache()
import jax.numpy as jnp
from gnark_tpu.ff import get_ff
from gnark_tpu.ntt import Domain

n = 1 << 20
ffr = get_ff("bn254_fr")
dom = Domain(ffr, n)
rng = np.random.RandomState(3)
q = ffr.p.modulus
vals = [int.from_bytes(rng.bytes(31), "little") % q for _ in range(n)]
v = jnp.asarray(ffr.encode(vals))

def chain(K):
    @jax.jit
    def f(a):
        def body(i, x):
            return dom.fft(x)
        return jax.lax.fori_loop(0, K, body, a)
    return f

times = {}
for K in (1, 5):
    f = chain(K)
    _ = np.asarray(f(v))
    best = float("inf")
    for _i in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(f(v))
        best = min(best, time.perf_counter() - t0)
    times[K] = best
per = (times[5] - times[1]) / 4
print(json.dumps({"ntt_2^20_ms": round(per * 1e3, 2)}))
