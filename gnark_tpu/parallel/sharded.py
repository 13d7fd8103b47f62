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
from gnark_tpu.msm.pippenger import _pick_params


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

    # check_vma=False: the Pippenger scan carries start as unvarying
    # zeros and become device-varying, which the varying-axes checker
    # rejects; the computation is genuinely per-shard so the check is
    # safely disabled.
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis), check_vma=False)
    def local(xs, ys, infs, sc):
        # auto-routed per shard: VMEM bucket mega-kernel on TPU, the
        # portable scan kernel elsewhere (msm/pippenger.msm routing)
        from gnark_tpu.msm import msm as _msm_auto
        R = _msm_auto(f, (xs, ys, infs), sc, nbits, c=c, groups=groups)
        return tuple(a[None] for a in R)   # (1, ...) per device

    partials = local(x, y, inf, scalars)   # (ndev, ...) stacked
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


@functools.lru_cache(maxsize=None)
def _twiddle_matrix(ff, n1: int, n2: int, inverse: bool):
    """T[k1, j2] = omega_n^(+-k1*j2) in Montgomery limb form."""
    p = ff.p.modulus
    n = n1 * n2
    w = ff.p.root_of_unity(n)
    if inverse:
        w = pow(w, -1, p)
    import numpy as np
    rows = []
    for k1 in range(n1):
        wk = pow(w, k1, p)
        acc = 1
        row = []
        for _ in range(n2):
            row.append(acc)
            acc = acc * wk % p
        rows.append(ff.encode(row))
    return jnp.asarray(np.stack(rows))


def ntt_sharded(ff, x, mesh: Mesh, axis: str = "pts",
                inverse: bool = False):
    """ONE size-n transform sharded across the mesh — the four-step
    algorithm (SURVEY §2.4 P4): column-sharded size-N1 NTTs, twiddle
    scaling, ALL-TO-ALL transpose over ICI, row-sharded size-N2 NTTs.

    x: (n, L) Montgomery limbs, n = N1*N2 with the split chosen so the
    mesh axis divides both. Returns the full natural-order transform,
    equal to Domain(ff, n).fft(x) / .ifft(x)."""
    from gnark_tpu.ntt import Domain

    n, L = x.shape
    D = mesh.shape[axis]
    k = n.bit_length() - 1
    n1 = 1 << (k // 2)
    n2 = n // n1
    while n1 % D or n2 % D:
        n1 <<= 1
        n2 >>= 1
        if n2 < D:
            raise ValueError(f"cannot split {n} across {D} devices")
    dom1 = Domain(ff, n1)
    dom2 = Domain(ff, n2)
    tw = _twiddle_matrix(ff, n1, n2, inverse)

    M = x.reshape(n1, n2, L)          # M[j1, j2] = x[n2*j1 + j2]
    # wait: row-major x.reshape(n1, n2) gives M[j1][j2] = x[j1*n2+j2] ✓

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(None, axis, None), P(None, axis, None)),
        out_specs=P(axis, None, None), check_vma=False)
    def four_step(m, twl):
        # (a) size-n1 transform along axis 0 for each local column
        fn1 = dom1.ifft if inverse else dom1.fft
        a = jax.vmap(fn1, in_axes=1, out_axes=1)(m)
        # (b) twiddle by omega^(k1*j2) (local columns of the matrix)
        a = ff.mul(a, twl)
        # (c) transpose via all-to-all: column shards -> row shards
        a = jax.lax.all_to_all(a, axis, split_axis=0, concat_axis=1,
                               tiled=True)
        # (d) size-n2 transform along axis 1 for each local row
        fn2 = dom2.ifft if inverse else dom2.fft
        return jax.vmap(fn2, in_axes=0, out_axes=0)(a)

    Xm = four_step(M, tw)             # (n1, n2, L), Xm[k1, k2]
    # X[k1 + n1*k2] = Xm[k1, k2]
    return jnp.transpose(Xm, (1, 0, 2)).reshape(n, L)
