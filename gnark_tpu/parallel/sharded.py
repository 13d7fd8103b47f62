"""Multi-chip sharding of MSM / NTT over a jax.sharding.Mesh.

The reference is single-process (SURVEY.md §2.4): this module is the
"missing-by-design" distributed layer, built the TPU way — shard_map
over a device mesh, XLA collectives over ICI:

  * MSM: points+scalars sharded over the mesh axis; each device runs
    the full Pippenger kernel on its shard; the per-device Jacobian
    partials are all-gathered (tiny: one point each) and tree-folded.
    This mirrors DIZK-style data-parallel MSM and the ICICLE chunked
    MSM (icicle.go:555-782) but across chips instead of within one GPU.
  * NTT: data-parallel over independent polynomial batches (the
    Groth16 H-computation runs 3 transforms — P2 overlap); in-transform
    stage sharding (all_to_all) is a later optimization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
shard_map = __import__('jax').shard_map

from gnark_tpu.ec.weierstrass import jac_add, jac_inf
from gnark_tpu.msm.pippenger import _msm_kernel, _pick_params, window_digits


def msm_sharded(f, points, scalars, nbits: int, mesh: Mesh,
                axis: str = "pts", c: int | None = None,
                groups: int | None = None):
    """MSM with points sharded across `axis` of `mesh`.

    Returns a Jacobian point (replicated). Requires n divisible by the
    axis size (pad with infinity points upstream if needed).
    """
    x, y, inf = points
    n = x.shape[0]
    ndev = mesh.shape[axis]
    assert n % ndev == 0, "pad points to a multiple of the mesh axis"
    n_local = n // ndev
    if c is None or groups is None:
        c_auto, g_auto = _pick_params(n_local, nbits)
        c = c or c_auto
        groups = groups or min(g_auto, max(n_local, 1))
    digits = window_digits(scalars, nbits, c)

    # check_vma=False: the Pippenger scan carries start as unvarying
    # zeros and become device-varying, which the varying-axes checker
    # rejects; the computation is genuinely per-shard so the check is
    # safely disabled.
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis), check_vma=False)
    def local(xs, ys, infs, dg):
        R = _msm_kernel(f, (xs, ys, infs), dg, nbits, c, groups)
        return tuple(a[None] for a in R)   # (1, ...) per device

    partials = local(x, y, inf, digits)    # (ndev, ...) stacked
    # fold the ndev partials (replicated, tiny)
    R = tuple(a[0] for a in partials)
    for i in range(1, ndev):
        R = jac_add(f, R, tuple(a[i] for a in partials))
    return R


def ntt_batch_sharded(domain, polys, mesh: Mesh, axis: str = "batch",
                      inverse: bool = False, coset: bool = False):
    """Batched NTT with independent polynomials sharded over `axis`.

    polys: (B, n, L) — B transforms of size n; B divisible by axis size.
    """
    ff = domain.ff

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=P(axis), out_specs=P(axis))
    def local(p):
        fn = domain.ifft if inverse else domain.fft
        return jax.vmap(lambda v: fn(v, coset=coset))(p)

    return local(polys)
