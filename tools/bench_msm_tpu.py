"""Slope-timed TPU MSM benchmark (honest device time).

The axon tunnel has ~330ms fixed dispatch latency and
block_until_ready can return early, so single-shot timings are
meaningless. Method: chain K data-dependent MSM iterations inside ONE
jit (rotating the scalar array so iterations can't be CSE'd), fetch
the result with np.asarray, and fit time vs K; the slope is the true
per-MSM device time.

Usage: python tools/bench_msm_tpu.py [log2n] [impl: bucket|scan]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    impl = sys.argv[2] if len(sys.argv) > 2 else "bucket"
    n = 1 << log2n

    import os
    os.makedirs("/root/.cache/gnark_tpu_xla_tpu", exist_ok=True)
    import jax
    from gnark_tpu.utils.cachekey import setup_cache; setup_cache()
    import jax.numpy as jnp
    from gnark_tpu.ec import curves, host
    from gnark_tpu.ff import get_ff

    curve = curves.CURVES["bn254"]
    ffp = get_ff(curve.fp.name)
    ffr = get_ff(curve.fr.name)
    rng = np.random.RandomState(42)

    # random-ish points: multiples of g1 with random small offsets
    # (host EC is slow; build 256 distinct points then tile)
    f1 = curve.host_fp
    base_pts, cur = [], curve.g1
    for _ in range(256):
        base_pts.append(cur)
        cur = host.ec_add(f1, cur, curve.g1)
    reps = n // 256
    pts = base_pts * reps + base_pts[: n - 256 * reps]
    x = jnp.asarray(ffp.encode([p[0] for p in pts]))
    y = jnp.asarray(ffp.encode([p[1] for p in pts]))
    inf = jnp.zeros((n,), bool)
    ks = [int.from_bytes(rng.bytes(31), "little") % curve.fr.modulus
          for _ in range(n)]
    scalars = jnp.asarray(ffr.encode(ks, mont=False))
    nbits = curve.fr.bits

    if impl == "bucket":
        from gnark_tpu.msm import bucket_kernel as bk

        def one(pts, s):
            return bk.msm_bucket(ffp, pts, s, nbits)
    elif impl == "chunked":
        from gnark_tpu.msm import bucket_kernel as bk

        def one(pts, s):
            return bk.msm_bucket_chunked(ffp, pts, s, nbits)
    else:
        from gnark_tpu.msm import pippenger as pip

        def one(pts, s):
            return pip.msm(ffp, pts, s, nbits)

    def chain(K):
        # points/scalars as ARGUMENTS, not closure constants: closed-
        # over device arrays embed in the compiled module (HTTP 413 on
        # the axon compile endpoint at 2^22) and defeat cache keying
        @jax.jit
        def f(xa, ya, infa, s):
            def body(i, carry):
                s_, acc = carry
                r = one((xa, ya, infa), s_)
                # rotate scalars by one row -> next iter differs;
                # fold r into acc so nothing is dead
                s2 = jnp.roll(s_, 1, axis=0)
                acc = tuple(a ^ b for a, b in zip(acc, r))
                return (s2, acc)
            z = tuple(jnp.zeros((xa.shape[1],), jnp.uint32)
                      for _ in range(3))
            _, acc = jax.lax.fori_loop(0, K, body, (s, z))
            return acc
        return lambda s: f(x, y, inf, s)

    # exact correctness check: point i is ((i % 256) + 1) * g1, so the
    # MSM equals (sum k_i * m_i mod r) * g1 — one host scalar mul
    from gnark_tpu.ec.weierstrass import jac_to_affine
    r1 = one((x, y, inf), scalars)
    rx, ry, rinf = jac_to_affine(ffp, r1)
    got = (int(ffp.decode(np.asarray(rx))), int(ffp.decode(np.asarray(ry))))
    total = sum(k * ((i % 256) + 1) for i, k in enumerate(ks)) \
        % curve.fr.modulus
    want = host.ec_mul(f1, curve.g1, total)
    ok = (got == want) and not bool(np.asarray(rinf))
    print(f"n=2^{log2n} impl={impl} correct={ok}")
    if not ok:
        print(f"  got  {got}\n  want {want}")
        sys.exit(1)

    times = {}
    for K in (1, 3):
        f = chain(K)
        t0 = time.time()
        r = f(scalars)
        _ = tuple(np.asarray(a) for a in r)
        compile_t = time.time() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            r = f(scalars)
            _ = tuple(np.asarray(a) for a in r)
            best = min(best, time.time() - t0)
        times[K] = best
        print(f"K={K}: compile+run={compile_t:.2f}s best_run={best:.3f}s")

    slope = (times[3] - times[1]) / 2
    print(f"per-MSM device time: {slope*1000:.1f} ms "
          f"-> {n/slope/1e6:.3f} M points/s")


if __name__ == "__main__":
    main()
