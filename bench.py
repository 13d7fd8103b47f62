"""Headline benchmark: BN254 G1 MSM throughput (points/sec) on one chip.

MSM is ~80% of Groth16 prove time (reference
backend/groth16/bn254/prove.go:187-305), so points/sec is the headline
metric (BASELINE.md target list). Baseline: gnark-crypto CPU MultiExp —
no published in-repo number (BASELINE.md) and no Go toolchain in this
image to measure one, so vs_baseline is reported against a
conservative reference-CPU estimate of 1e6 points/s for 2^16-scale
MSMs on server CPUs.

Implementation benched: the VMEM-resident bucket mega-kernel
(gnark_tpu/msm/bucket_kernel.py). Timing method: the axon tunnel has
~300ms fixed dispatch latency, so one-shot wall times mislead; we
chain K data-dependent MSMs inside ONE jit and fit time vs K — the
slope is the true per-MSM device time.

Robustness contract (round-2 postmortem: the driver's timeout killed
the bench mid-secondary and the headline never printed): the headline
is computed FIRST; every secondary metric runs in a SUBPROCESS with
its own timeout under a global deadline; the headline JSON line is
printed LAST (the driver parses the final JSON line).

Prints JSON lines: {"metric", "value", "unit", "vs_baseline"};
headline = the last line.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

DEADLINE = time.monotonic() + float(
    os.environ.get("GNARK_TPU_BENCH_BUDGET", "900"))

# Speed-of-light anchors (BASELINE.md Targets #2): tools/mul_bench.py
# measured 1.415 ns per bn254 Fp Montgomery mul per lane on this chip
# (2026-08-20, variant "base") -> 707e6 field-muls/s/chip.
# MSM algorithmic floor: ceil(256/c)*11 muls/point (complete mixed
# adds, c=16 window) -> 176 muls/pt -> 4.0e6 pts/s.
# NTT 2^20 floor: (n/2)*log2(n) = 10.49e6 butterfly muls -> 14.8 ms.
FIELD_MULS_PER_SEC = 707e6
MSM_SOL_PPS = FIELD_MULS_PER_SEC / (16 * 11)
NTT20_SOL_MS = (1 << 19) * 20 / FIELD_MULS_PER_SEC * 1e3


def _left():
    return DEADLINE - time.monotonic()


def _random_scalar_limbs(ffr, n: int, seed: int) -> np.ndarray:
    """(n, L) random 16-bit limb arrays with the top limb masked a few
    bits short of the modulus width — values uniformly < 2^(bits-1)
    < r without any host big-int work (encoding 2^20 python ints
    element-wise blew the round-2 bench budget)."""
    rng = np.random.RandomState(seed)
    L = ffr.n
    limbs = rng.randint(0, 1 << 16, size=(n, L)).astype(np.uint32)
    top_bits = (ffr.p.bits - 1) - 16 * (L - 1)
    limbs[:, -1] &= (1 << max(top_bits, 0)) - 1
    return limbs


def _setup_jax():
    from gnark_tpu.utils.cachekey import setup_cache
    return setup_cache()


def _msm_points_per_sec(n: int) -> float:
    """Slope-timed MSM throughput at size n (points/s)."""
    jax = _setup_jax()
    import jax.numpy as jnp
    from gnark_tpu.ec import curves, host
    from gnark_tpu.ff import get_ff
    from gnark_tpu.msm import bucket_kernel as bk

    curve = curves.CURVES["bn254"]
    ffp = get_ff(curve.fp.name)
    ffr = get_ff(curve.fr.name)

    # deterministic input: points from a doubling chain on host
    # (cheap: reuse a small pool, MSM cost does not depend on values)
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

    scalars = jnp.asarray(_random_scalar_limbs(ffr, n, seed=7))
    nbits = curve.fr.bits

    def chain(K):
        # points/scalars as ARGUMENTS (not closure constants) so the
        # persistent compile cache keys only on shapes
        @jax.jit
        def f(xa, ya, infa, s):
            def body(i, carry):
                s_, acc = carry
                r = bk.msm_bucket(ffp, (xa, ya, infa), s_, nbits)
                s2 = jnp.roll(s_, 1, axis=0)   # next iter differs
                acc = tuple(a ^ b for a, b in zip(acc, r))
                return (s2, acc)
            z = tuple(jnp.zeros((xa.shape[1],), jnp.uint32)
                      for _ in range(3))
            _, acc = jax.lax.fori_loop(0, K, body, (s, z))
            return acc
        return f

    times = {}
    ks = (1, 5) if n <= 1 << 18 else (1, 3)
    for K in ks:
        f = chain(K)
        r = f(x, y, inf, scalars)
        _ = tuple(np.asarray(a) for a in r)   # compile + barrier
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            r = f(x, y, inf, scalars)
            _ = tuple(np.asarray(a) for a in r)
            best = min(best, time.perf_counter() - t0)
        times[K] = best

    per_msm = (times[ks[1]] - times[ks[0]]) / (ks[1] - ks[0])
    return n / per_msm


def _secondary_msm20():
    pps = _msm_points_per_sec(1 << 20)
    print(json.dumps({
        "metric": "bn254_g1_msm_2^20_points_per_sec",
        "value": round(pps, 1), "unit": "points/s",
        "vs_baseline": round(pps / 1e6, 4),
        "sol_frac": round(pps / MSM_SOL_PPS, 4)}), flush=True)


def _secondary_msm22():
    """BASELINE.json's headline size: BN254 G1 MSM at 2^22.

    vs_baseline divides by 4e6 pts/s — a MULTI-CORE server running
    gnark-crypto MultiExp at 2^22 plausibly does 4-8M pts/s (round-4
    verdict Weak #2; no in-repo number exists and no Go toolchain is
    in-image to measure one), so this is a per-chip vs whole-CPU-box
    comparison. sol_frac (vs the measured 707M field-muls/s anchor at
    c=16 windowing) is the honest hardware-efficiency number."""
    pps = _msm_points_per_sec(1 << 22)
    print(json.dumps({
        "metric": "bn254_g1_msm_2^22_points_per_sec",
        "value": round(pps, 1), "unit": "points/s",
        "vs_baseline": round(pps / 4e6, 4),
        "baseline_note": "4e6 pts/s multi-core gnark-crypto estimate",
        "sol_frac": round(pps / MSM_SOL_PPS, 4)}), flush=True)


def _secondary_ntt20():
    """Forward NTT of size 2^20, slope-timed (K-chained)."""
    jax = _setup_jax()
    import jax.numpy as jnp
    from gnark_tpu.ff import get_ff
    from gnark_tpu.ntt import Domain
    n = 1 << 20
    ffr = get_ff("bn254_fr")
    dom = Domain(ffr, n)
    # raw random residues < 2^(bits-1) < q; NTT timing is
    # value-independent, so skip the per-element Montgomery encode
    v = jnp.asarray(_random_scalar_limbs(ffr, n, seed=3))

    def chain(K):
        @jax.jit
        def f(a):
            def body(i, x):
                return dom.fft(x)
            r = jax.lax.fori_loop(0, K, body, a)
            return r[0, :2]   # tiny fetch: the axon tunnel downloads
            # ~64MB/2s, which would swamp the slope variance otherwise
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
    # baseline: gnark-crypto CPU FFT 2^20 ~ 30ms on server CPUs
    # (order-of-magnitude; no in-repo reference number exists)
    print(json.dumps({
        "metric": "bn254_fr_ntt_2^20_ms",
        "value": round(per * 1e3, 2), "unit": "ms",
        "vs_baseline": round(0.030 / per, 4) if per > 0 else 0,
        "sol_frac": round(NTT20_SOL_MS / (per * 1e3), 4)
        if per > 0 else 0,
    }), flush=True)


def _secondary_ntt24():
    """Forward NTT of size 2^24 (BASELINE.json north-star size),
    slope-timed."""
    jax = _setup_jax()
    import jax.numpy as jnp
    from gnark_tpu.ff import get_ff
    from gnark_tpu.ntt import get_domain
    n = 1 << 24
    ffr = get_ff("bn254_fr")
    dom = get_domain(ffr, n)
    v = jnp.asarray(_random_scalar_limbs(ffr, n, seed=9))

    def chain(K):
        @jax.jit
        def f(a):
            def body(i, x):
                return dom.fft(x)
            r = jax.lax.fori_loop(0, K, body, a)
            return r[0, :2]
        return f

    times = {}
    for K in (1, 3):
        f = chain(K)
        _ = np.asarray(f(v))
        best = float("inf")
        for _i in range(2):
            t0 = time.perf_counter()
            _ = np.asarray(f(v))
            best = min(best, time.perf_counter() - t0)
        times[K] = best
    per = (times[3] - times[1]) / 2
    sol_ms = (1 << 23) * 24 / FIELD_MULS_PER_SEC * 1e3
    print(json.dumps({
        "metric": "bn254_fr_ntt_2^24_ms",
        "value": round(per * 1e3, 2), "unit": "ms",
        # ~16x the 2^20 CPU estimate (0.48 s)
        "vs_baseline": round(0.48 / per, 4) if per > 0 else 0,
        "sol_frac": round(sol_ms / (per * 1e3), 4) if per > 0 else 0,
    }), flush=True)


def _synth_square_chain(n_chains: int, chain_len: int):
    """Synthetic R1CS: n_chains independent squaring chains of
    chain_len (total n_chains*chain_len constraints) — wide levels so
    the native solver parallelizes, built directly in the IR (a
    2^18-api-call frontend compile would eat the bench budget)."""
    from gnark_tpu import fields
    from gnark_tpu.constraint.system import (
        ConstraintSystem, Instruction, R1C)
    F = fields.BN254_FR
    cs = ConstraintSystem(F, "r1cs")
    cs.secret_names = [f"x{i}" for i in range(n_chains)]
    for c in range(n_chains):
        w = 1 + c
        for _ in range(chain_len):
            o = cs.new_internal_wire()
            cs.r1cs.append(R1C(((1, w),), ((1, w),), ((1, o),)))
            cs.add_instruction(
                Instruction(kind="r1c", cidx=len(cs.r1cs) - 1,
                            outputs=(o,)), [w])
            w = o
    return cs


def _g16_at(log2n: int, baseline_s: float):
    """End-to-end Groth16 prove wall time at 2^log2n constraints
    (solve + computeH NTTs + 5 MSMs; dummy keys — MSM/NTT cost is
    value-independent, reference groth16.DummySetup). The baseline is
    a docs-scale gnark-CPU estimate (no in-repo number exists)."""
    import random
    _setup_jax()
    from gnark_tpu.backend import groth16

    n_chains = 1 << max(log2n - 9, 9)
    chain_len = (1 << log2n) // n_chains
    cs = _synth_square_chain(n_chains, chain_len)
    pk = groth16.dummy_setup(cs, "bn254")
    secrets_in = [i + 2 for i in range(n_chains)]
    # warm (compiles)
    groth16.prove(cs, pk, [], secrets_in, rng=random.Random(6))
    best = float("inf")
    for i in range(2):
        t0 = time.perf_counter()
        groth16.prove(cs, pk, [], secrets_in, rng=random.Random(7 + i))
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({
        "metric": f"groth16_prove_2^{log2n}_ms",
        "value": round(best * 1e3, 1), "unit": "ms",
        "vs_baseline": round(baseline_s / best, 4),
        "baseline_note": f"{baseline_s}s gnark-CPU docs-scale estimate",
    }), flush=True)


def _secondary_g16():
    _g16_at(18, 1.5)


def _secondary_g16_20():
    _g16_at(20, 5.0)


def _secondary_plonk18():
    """End-to-end PLONK prove at 2^17 gates on the device pipeline
    (stage compiles are cacheable across processes now that the
    persistent-cache keys are stable — utils/cachekey.py)."""
    import random
    _setup_jax()
    from gnark_tpu import fields
    from gnark_tpu.backend import kzg, plonk
    from gnark_tpu.constraint.system import (
        ConstraintSystem, Instruction, SparseR1C)
    F = fields.BN254_FR
    q = F.modulus
    cs = ConstraintSystem(F, "scs")
    n_chains, chain_len = 1024, 128          # 2^17 gates
    cs.secret_names = [f"x{i}" for i in range(n_chains)]
    for c in range(n_chains):
        w = 1 + c
        for _ in range(chain_len):
            o = cs.new_internal_wire()
            # x*x - o == 0
            cs.sparse.append(SparseR1C(w, w, o, 0, 0, q - 1, 1, 0))
            cs.add_instruction(
                Instruction(kind="scs", cidx=len(cs.sparse) - 1,
                            outputs=(o,)), [w])
            w = o
    srs_n = 1 << 18
    srs = kzg.setup_srs("bn254", srs_n + 8, rng=random.Random(3),
                        with_host=False)
    pk, vk = plonk.setup(cs, srs)
    secrets_in = [i + 2 for i in range(n_chains)]
    plonk.prove(cs, pk, [], secrets_in, rng=random.Random(4))
    best = float("inf")
    for i in range(2):
        t0 = time.perf_counter()
        plonk.prove(cs, pk, [], secrets_in, rng=random.Random(5 + i))
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({
        "metric": "plonk_prove_2^17_ms",
        "value": round(best * 1e3, 1), "unit": "ms",
        # gnark CPU proves ~2^17 gates in roughly 2s (docs-scale
        # estimate; no in-repo number)
        "vs_baseline": round(2.0 / best, 4),
        "baseline_note": "2s gnark-CPU docs-scale estimate",
    }), flush=True)


def _secondary_rollup():
    """BASELINE config #4: the EdDSA+Merkle rollup at ~1M constraints
    (depth-16 tree, 16 transfers), proven with dummy keys on device
    (round-4 verdict item #3: the ~1M-constraint BASELINE config)."""
    os.environ["ROLLUP_DEPTH"] = "16"
    os.environ["ROLLUP_TXS"] = "16"
    _setup_jax()
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "rollup_bench", os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "examples", "rollup.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    dt, nc = mod.main(prove=True, dummy=True)
    print(json.dumps({
        "metric": f"groth16_prove_rollup_{nc}c_ms",
        "value": round(dt * 1e3, 1), "unit": "ms",
        "vs_baseline": round(5.0 / dt, 4),
        "baseline_note": "5s gnark-CPU docs-scale estimate at ~1M",
    }), flush=True)


# budgets include persistent-cache executable loads (a fresh process
# pays minutes of deserialization over the axon toolchain)
SECONDARIES = {
    "msm20": (_secondary_msm20, 180),
    "msm22": (_secondary_msm22, 300),
    "ntt20": (_secondary_ntt20, 240),
    "g16": (_secondary_g16, 700),
    "g16_20": (_secondary_g16_20, 800),
    "plonk18": (_secondary_plonk18, 900),
    "rollup": (_secondary_rollup, 800),
    "ntt24": (_secondary_ntt24, 420),
}


def _run_secondary(name: str):
    """Run one secondary metric in a subprocess so a hang/crash cannot
    eat the global budget or kill the headline."""
    _, want = SECONDARIES[name]
    budget = min(want, _left() - 30)   # keep 30s for headline reprint
    if budget < 30:
        return
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--secondary",
             name],
            timeout=budget, capture_output=True, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        for line in r.stdout.splitlines():
            if line.startswith("{"):
                print(line, flush=True)
    except subprocess.TimeoutExpired:
        print(json.dumps({"metric": f"{name}_timeout", "value": 0,
                          "unit": f">{int(budget)}s", "vs_baseline": 0}),
              flush=True)
    except Exception as e:  # noqa: BLE001 — secondaries must not kill bench
        print(json.dumps({"metric": f"{name}_error", "value": 0,
                          "unit": str(e)[:60], "vs_baseline": 0}),
              flush=True)


def main():
    # --- headline FIRST (its value must survive any later failure) ---
    pps = _msm_points_per_sec(1 << 16)
    baseline_pps = 1e6  # conservative gnark-CPU estimate, see docstring
    headline = json.dumps({
        "metric": "bn254_g1_msm_2^16_points_per_sec",
        "value": round(pps, 1),
        "unit": "points/s",
        "vs_baseline": round(pps / baseline_pps, 4),
        "sol_frac": round(pps / MSM_SOL_PPS, 4),
    })
    print(headline, flush=True)

    # --- secondary metrics, each in a time-boxed subprocess ---
    # priority order under the driver's budget: the north-star sizes
    # first (msm22/ntt/g16 prove), msm20 last (it tracks msm22).
    # The headline is re-printed after EVERY secondary so the LAST
    # JSON line is always the headline even if the driver's outer
    # timeout kills the bench mid-secondary.
    # g16_20 AFTER rollup/plonk18: if its cache entry is missing it
    # compiles for minutes and would starve the two metrics the
    # round-4 verdict names first (cheapest-warmed-first ordering).
    for name in ("ntt20", "msm22", "ntt24", "g16", "rollup",
                 "plonk18", "g16_20", "msm20"):
        if _left() > 60:
            _run_secondary(name)
            print(headline, flush=True)

    # headline LAST (driver parses the final JSON line)
    print(headline, flush=True)


if __name__ == "__main__":
    if len(sys.argv) == 3 and sys.argv[1] == "--secondary":
        SECONDARIES[sys.argv[2]][0]()
    else:
        main()
