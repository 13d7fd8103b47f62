"""Microbenchmarks of the XLA primitives a sort-based MSM would lean
on (sort, gather, cumsum, scatter) at MSM sizes, slope-timed like
bench.py (the axon tunnel adds ~0.3s fixed dispatch latency).

Usage: python tools/xla_probe.py [n_log2]
"""

import sys
import time

sys.path.insert(0, "/root/repo")
from gnark_tpu.utils.cachekey import setup_cache

jax = setup_cache()
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

N = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 22)


def slope(make_fn, name, ks=(1, 5)):
    times = {}
    for K in ks:
        f = jax.jit(make_fn(K))
        r = f()
        np.asarray(jax.tree_util.tree_leaves(r)[0])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            r = f()
            np.asarray(jax.tree_util.tree_leaves(r)[0])
            best = min(best, time.perf_counter() - t0)
        times[K] = best
    per = (times[ks[1]] - times[ks[0]]) / (ks[1] - ks[0])
    print(f"{name}: {per*1e3:.2f} ms")
    return per


rng = np.random.RandomState(0)
keys_np = rng.randint(0, 1 << 15, size=N).astype(np.uint32)
keys0 = jnp.asarray(keys_np)
rows_np = rng.randint(0, 1 << 32, size=(N, 16), dtype=np.uint64
                      ).astype(np.uint32)
rows0 = jnp.asarray(rows_np)


def mk_sort(K):
    def f():
        def body(i, k):
            return jax.lax.sort(k ^ i.astype(jnp.uint32))
        return jax.lax.fori_loop(0, K, body, keys0)[:8]
    return f


def mk_sort_kv(K):
    idx0 = jnp.arange(N, dtype=jnp.uint32)

    def f():
        def body(i, carry):
            k, v = carry
            return jax.lax.sort_key_val(k ^ i.astype(jnp.uint32), v)
        k, v = jax.lax.fori_loop(0, K, body, (keys0, idx0))
        return k[:8], v[:8]
    return f


def mk_argsort(K):
    def f():
        def body(i, k):
            p = jnp.argsort(k ^ i.astype(jnp.uint32))
            return p.astype(jnp.uint32)
        return jax.lax.fori_loop(0, K, body, keys0)[:8]
    return f


def mk_gather_rows(K):
    perm = jnp.asarray(rng.permutation(N).astype(np.int32))

    def f():
        def body(i, r):
            return jnp.take(r, perm, axis=0)
        return jax.lax.fori_loop(0, K, body, rows0)[0, :4]
    return f


def mk_cumsum(K):
    def f():
        def body(i, k):
            return jnp.cumsum(k ^ i.astype(jnp.uint32), dtype=jnp.uint32)
        return jax.lax.fori_loop(0, K, body, keys0)[:8]
    return f


def mk_scatter(K):
    B = 1 << 15
    sidx = jnp.asarray(rng.permutation(N)[:B].astype(np.int32))
    vals = jnp.asarray(rng.randint(0, 1 << 31, size=(B, 48),
                                   dtype=np.int64).astype(np.uint32))
    base = jnp.zeros((B, 48), jnp.uint32)

    def f():
        def body(i, b):
            return b.at[sidx % B].set(vals ^ i.astype(jnp.uint32))
        return jax.lax.fori_loop(0, K, body, base)[0, :4]
    return f


print(f"n = 2^{int(np.log2(N))}")
slope(mk_sort, "lax.sort u32 keys")
slope(mk_sort_kv, "lax.sort_key_val u32+u32")
slope(mk_argsort, "argsort u32")
slope(mk_gather_rows, "gather (N,16)u32 rows by perm")
slope(mk_cumsum, "cumsum u32")
slope(mk_scatter, "scatter 2^15 x 48 u32 rows")
