"""End-of-round warm pass: run every bench secondary once so the jax
persistent compile cache (stable keys — utils/cachekey.py) holds every
executable the driver's fresh `python bench.py` will need.

Run this as the LAST act of a round, AFTER the final source commit
that touches any jitted code: the driver's budgeted run then loads
compiled executables instead of spending minutes per stage over the
axon tunnel (the round-3/4 `*_timeout` root cause).

Usage: python tools/warm_bench.py [secondary ...]   (default: all)
"""

import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

ORDER = ("ntt20", "msm22", "ntt24", "g16", "g16_20",
         "rollup", "plonk18", "msm20")


def main():
    names = sys.argv[1:] or list(ORDER)
    # headline first (2^16 MSM compiles)
    import bench
    t0 = time.perf_counter()
    pps = bench._msm_points_per_sec(1 << 16)
    print(f"headline warm: {pps:.0f} pts/s "
          f"({time.perf_counter() - t0:.0f}s)", flush=True)
    for name in names:
        t0 = time.perf_counter()
        r = subprocess.run(
            [sys.executable, "/root/repo/bench.py", "--secondary", name],
            capture_output=True, text=True)
        took = time.perf_counter() - t0
        out = [l for l in r.stdout.splitlines() if l.startswith("{")]
        print(f"{name}: {took:.0f}s rc={r.returncode} "
              f"{out[-1] if out else r.stderr.strip()[-200:]}",
              flush=True)


if __name__ == "__main__":
    main()
