"""Headline benchmark: BN254 G1 MSM throughput (points/sec) on one chip.

MSM is ~80% of Groth16 prove time (reference
backend/groth16/bn254/prove.go:187-305), so points/sec is the headline
metric (BASELINE.md target list). Baseline: gnark-crypto CPU MultiExp —
no published in-repo number (BASELINE.md), so vs_baseline is reported
against a conservative reference-CPU estimate of 1e6 points/s for
2^16-scale MSMs on server CPUs; this will be replaced by a measured
gnark number when a Go toolchain is available to run it.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def main():
    import os
    os.makedirs("/root/.cache/gnark_tpu_xla_tpu", exist_ok=True)
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/gnark_tpu_xla_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from gnark_tpu.ec import curves, host
    from gnark_tpu.ff import get_ff
    from gnark_tpu.msm.pippenger import _msm_kernel, _pick_params, window_digits

    n = 1 << 16
    curve = curves.CURVES["bn254"]
    ffp = get_ff(curve.fp.name)
    ffr = get_ff(curve.fr.name)

    # deterministic input: points = (i+1)*G via doubling chain on host
    # (cheap: reuse a small pool, MSM cost does not depend on point values)
    pool = 64
    f1 = curve.host_fp
    pts, cur = [], curve.g1
    for _ in range(pool):
        pts.append(cur)
        cur = host.ec_dbl(f1, cur)
    xs = ffp.encode([p[0] for p in pts])
    ys = ffp.encode([p[1] for p in pts])
    reps = n // pool
    x = jnp.asarray(np.tile(xs, (reps, 1)))
    y = jnp.asarray(np.tile(ys, (reps, 1)))
    inf = jnp.zeros((n,), bool)

    rng = np.random.RandomState(7)
    ks = [int.from_bytes(rng.bytes(31), "little") % curve.fr.modulus
          for _ in range(n)]
    scalars = jnp.asarray(ffr.encode(ks, mont=False))

    nbits = curve.fr.bits
    # pinned (not auto) so the driver-run compile stays ~1 min on the
    # remote compiler: c=8/G=128 measured 41s compile, ~1.3s steady
    c, groups = 8, 128
    digits = window_digits(scalars, nbits, c)

    fn = jax.jit(lambda p, d: _msm_kernel(ffp, p, d, nbits, c, groups))

    def run_and_fetch():
        # fetch (not block_until_ready): the remote-TPU tunnel's
        # block_until_ready can return before execution finishes;
        # np.asarray is the only reliable barrier.
        R = fn((x, y, inf), digits)
        return [np.asarray(a) for a in R]

    run_and_fetch()                    # compile + first run
    run_and_fetch()                    # steady state
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        run_and_fetch()
    dt = (time.perf_counter() - t0) / iters

    pps = n / dt
    baseline_pps = 1e6  # conservative gnark-CPU estimate, see docstring
    print(json.dumps({
        "metric": "bn254_g1_msm_2^16_points_per_sec",
        "value": round(pps, 1),
        "unit": "points/s",
        "vs_baseline": round(pps / baseline_pps, 4),
    }))


if __name__ == "__main__":
    main()
