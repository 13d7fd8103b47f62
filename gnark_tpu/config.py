"""Global kernel-tuning knobs.

LIMB_UNROLL: unroll factor for the per-limb loops inside field
arithmetic (CIOS Montgomery mul, carry chains).

  * On TPU, sequential lax.scan iterations cost ~1us each in loop
    overhead; a 16-limb mul as a pure scan is latency-bound. Unrolling
    trades compile time for ~an order of magnitude runtime.
  * On CPU (tests), full unrolling explodes compile time (a complete
    Jacobian add is ~4k ops unrolled), so we keep the scan.

Resolved lazily on first use so tests can force the platform first.
"""

from __future__ import annotations

import functools
import os


@functools.lru_cache(maxsize=None)
def use_pallas() -> bool:
    """Use fused Pallas EC kernels (TPU default; GNARK_TPU_PALLAS=0/1
    overrides — tests set 1 on CPU to exercise interpret mode)."""
    env = os.environ.get("GNARK_TPU_PALLAS")
    if env is not None:
        return env == "1"
    import jax
    try:
        return jax.devices()[0].platform != "cpu"
    except Exception:
        return False


@functools.lru_cache(maxsize=None)
def limb_unroll() -> int:
    env = os.environ.get("GNARK_TPU_LIMB_UNROLL")
    if env:
        return int(env)
    import jax
    try:
        platform = jax.devices()[0].platform
    except Exception:
        platform = "cpu"
    return 8 if platform != "cpu" else 1


@functools.lru_cache(maxsize=None)
def use_native_solver() -> bool:
    """Route prove-path witness solving through the C++ level-parallel
    solver (native/solver.cpp) when the field fits its limb widths.
    GNARK_TPU_NATIVE_SOLVER=0/1 overrides (default on; tests compare
    both paths explicitly)."""
    env = os.environ.get("GNARK_TPU_NATIVE_SOLVER")
    if env is not None:
        return env == "1"
    return True


def msm_impl() -> str:
    """MSM kernel selection: "auto" (bucket on TPU, scan elsewhere),
    "bucket", or "scan". GNARK_TPU_MSM_IMPL overrides."""
    import os
    return os.environ.get("GNARK_TPU_MSM_IMPL", "auto")
