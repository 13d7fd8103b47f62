"""Standalone Pallas field-op kernels (flat batches).

mul_p: Montgomery product over (n, L) uint32 arrays as ONE pallas_call
(fully unrolled CIOS in-kernel). Used by the NTT butterflies on TPU,
where the portable scan-based mul is loop-overhead-bound.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gnark_tpu.ff.mont import FF
from gnark_tpu.ff.pallas_mont import TFF

_T = 256


@functools.lru_cache(maxsize=None)
def _tff(name: str) -> TFF:
    from gnark_tpu.fields import FIELDS
    return TFF(FIELDS[name])


def _interpret() -> bool:
    return jax.devices()[0].platform == "cpu"


@functools.partial(jax.jit, static_argnums=(0,))
def mul_p(ff: FF, a, b):
    """Elementwise Montgomery mul over flat (n, L) arrays (broadcasts
    b of shape (1, L) / (L,))."""
    f = _tff(ff.p.name)
    L = ff.n
    n = a.shape[0]
    b = jnp.broadcast_to(b.reshape((-1, L)), (n, L))
    pad = -n % _T
    if pad:
        z = jnp.zeros((pad, L), a.dtype)
        a = jnp.concatenate([a, z], 0)
        b = jnp.concatenate([b, z], 0)
    np_ = a.shape[0]

    def kernel(pcol, onecol, x, y, o):
        fb = f.bind(pcol[:], onecol[:])
        o[:] = fb.mul(x[:].T, y[:].T).T

    spec = pl.BlockSpec((_T, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((np_, L), jnp.uint32),
        grid=(np_ // _T,),
        in_specs=[cspec, cspec, spec, spec],
        out_specs=spec,
        interpret=_interpret(),
    )(*f.consts(), a, b)
    return out[:n]


@functools.partial(jax.jit, static_argnums=(0, 4))
def butterfly_p(ff: FF, even, odd, tw, half: int):
    """Fused NTT butterfly stage: returns (even + odd*tw,
    even - odd*tw) in ONE pallas pass (the separate mul/add/sub/concat
    XLA pipeline costs 3 HBM round-trips and 8x the grid steps).

    even/odd: (n2, L); tw: (half, L) stage twiddles, pattern
    tw[j % half] along rows."""
    f = _tff(ff.p.name)
    L = ff.n
    n2 = even.shape[0]
    T = min(2048, max(_T, n2))
    pad = -n2 % T
    if pad:
        z = jnp.zeros((pad, L), even.dtype)
        even = jnp.concatenate([even, z], 0)
        odd = jnp.concatenate([odd, z], 0)
    np_ = even.shape[0]

    if half >= T:
        assert half % T == 0
        reps = half // T
        twa = tw
        tw_index = lambda i: (i % reps, 0)
    else:
        twa = jnp.tile(tw, (T // half, 1))
        tw_index = lambda i: (0, 0)

    def kernel(pcol, onecol, e, o_, t, oe, oo):
        fb = f.bind(pcol[:], onecol[:])
        prod = fb.mul(o_[:].T, t[:].T)
        ev = e[:].T
        oe[:] = fb.add(ev, prod).T
        oo[:] = fb.sub(ev, prod).T

    spec = pl.BlockSpec((T, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((T, L), tw_index, memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    oe, oo = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((np_, L), jnp.uint32),
                   jax.ShapeDtypeStruct((np_, L), jnp.uint32)),
        grid=(np_ // T,),
        in_specs=[cspec, cspec, spec, spec, tspec],
        out_specs=(spec, spec),
        interpret=_interpret(),
    )(*f.consts(), even, odd, twa)
    return oe[:n2], oo[:n2]
