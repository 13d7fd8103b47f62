"""Slope-timed breakdown of the 2^20 NTT on TPU: bit-reverse gather
vs butterfly stages vs full transform. Usage: python tools/ntt_probe.py
[log2n]."""
import sys; sys.path.insert(0, "/root/repo")  # noqa: E702
import json
import os
import time

import numpy as np

os.makedirs("/root/.cache/gnark_tpu_xla_tpu", exist_ok=True)
import jax  # noqa: E402
from gnark_tpu.utils.cachekey import setup_cache; setup_cache()
import jax.numpy as jnp  # noqa: E402

from gnark_tpu.ff import get_ff  # noqa: E402
from gnark_tpu.ntt import Domain  # noqa: E402
from gnark_tpu.ntt.domain import _ntt_kernel  # noqa: E402

log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
n = 1 << log2n
ffr = get_ff("bn254_fr")
dom = Domain(ffr, n)
rng = np.random.RandomState(3)
q = ffr.p.modulus
vals = [int.from_bytes(rng.bytes(31), "little") % q for _ in range(n)]
v = jnp.asarray(ffr.encode(vals))


def slope(make_chain, Ks=(1, 5)):
    times = {}
    for K in Ks:
        f = make_chain(K)
        _ = np.asarray(f(v))
        best = float("inf")
        for _i in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(f(v))
            best = min(best, time.perf_counter() - t0)
        times[K] = best
    return (times[Ks[1]] - times[Ks[0]]) / (Ks[1] - Ks[0])


def chain_full(K):
    @jax.jit
    def f(a):
        return jax.lax.fori_loop(0, K, lambda i, x: dom.fft(x), a)
    return f


def chain_rev(K):
    rev = dom._rev

    @jax.jit
    def f(a):
        return jax.lax.fori_loop(0, K, lambda i, x: x[rev], a)
    return f


def chain_stages(K):
    """All butterfly stages, no bit-reverse (feeds output back in)."""
    tw = dom._tw_fwd
    idx = jnp.arange(n, dtype=jnp.int32)

    @jax.jit
    def f(a):
        def body(i, x):
            return _ntt_kernel(ffr, x, idx, tw)   # identity perm
        return jax.lax.fori_loop(0, K, body, a)
    return f


print(json.dumps({
    "n": f"2^{log2n}",
    "full_ms": round(slope(chain_full) * 1e3, 2),
    "rev_ms": round(slope(chain_rev) * 1e3, 2),
    "stages_ms": round(slope(chain_stages) * 1e3, 2),
}))
