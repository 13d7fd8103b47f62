"""Multi-chip scaling-efficiency benchmark (BASELINE.md Targets #3:
>=80% efficiency at N>=2).

Measures sharded-MSM throughput (points/s) at 1, 2, 4, ... devices of
the runtime mesh and prints an ops/s-vs-N curve with efficiency
relative to the 1-device run.

On this environment only ONE real TPU chip is reachable (the axon
tunnel), so a real curve cannot be produced here — the driver's
dryrun_multichip validates that the sharded path compiles+executes on
an 8-virtual-device mesh instead. Run this tool unchanged on a real
multi-chip slice:

    python tools/scaling_bench.py            # real devices
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
        python tools/scaling_bench.py --virtual   # correctness-only

Virtual-mode numbers measure collective OVERHEAD on a shared CPU, not
speedup, and are labeled as such.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main(n: int = 1 << 18, virtual: bool = False):
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from gnark_tpu.ec import curves, host
    from gnark_tpu.ff import get_ff
    from gnark_tpu.parallel import msm_sharded

    curve = curves.CURVES["bn254"]
    ffp = get_ff(curve.fp.name)
    ffr = get_ff(curve.fr.name)
    devs = jax.devices()
    print(f"# devices: {len(devs)} ({devs[0].platform})", flush=True)

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
    rng = np.random.RandomState(3)
    L = ffr.n
    limbs = rng.randint(0, 1 << 16, size=(n, L)).astype(np.uint32)
    limbs[:, -1] &= (1 << max((ffr.p.bits - 1) - 16 * (L - 1), 0)) - 1
    sc = jnp.asarray(limbs)
    nbits = curve.fr.bits

    base = None
    nd = 1
    rows = []
    while nd <= len(devs):
        mesh = Mesh(np.array(devs[:nd]), ("shard",))
        t_best = float("inf")
        r = msm_sharded(ffp, (x, y, inf), sc, nbits, mesh, axis="shard")
        jax.block_until_ready(r)
        for _ in range(3):
            t0 = time.perf_counter()
            r = msm_sharded(ffp, (x, y, inf), sc, nbits, mesh,
                            axis="shard")
            jax.block_until_ready(r)
            t_best = min(t_best, time.perf_counter() - t0)
        pps = n / t_best
        if base is None:
            base = pps
        eff = pps / (base * nd)
        rows.append({"devices": nd, "points_per_sec": round(pps, 1),
                     "efficiency_vs_1dev": round(eff, 4),
                     "mode": "virtual-overhead" if virtual else "real"})
        print(json.dumps(rows[-1]), flush=True)
        nd *= 2
    return rows


if __name__ == "__main__":
    virt = "--virtual" in sys.argv
    if virt:
        import os
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
    main(virtual=virt)
