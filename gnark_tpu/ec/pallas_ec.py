"""Fused Pallas EC kernels (G1 / base-field groups).

Each kernel performs a COMPLETE Jacobian group operation on a block of
points in one pass — the whole formula (dozens of field muls) is
straight-line unrolled VPU code, eliminating the per-iteration scan
overhead that dominates the portable jnp path on TPU (see
ff/pallas_mont.py docstring for the measured story).

Exports drop-in replacements for gnark_tpu.ec.weierstrass ops
(batched over leading dim n, standard (n, L) layout — kernels
transpose to (L, T) tiles internally):

    jac_add_p(ff, P, Q)         complete add
    jac_add_mixed_p(ff, P, A)   complete mixed add (affine + inf mask)
    jac_double_p(ff, P)         double

Used by the MSM when config.use_pallas() (TPU); CPU tests exercise the
same kernels in pallas interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gnark_tpu.ff.mont import FF
from gnark_tpu.ff.pallas_mont import TFF

_T = 128  # batch tile (lanes)


@functools.lru_cache(maxsize=None)
def _tff(name: str) -> TFF:
    from gnark_tpu.fields import FIELDS
    return TFF(FIELDS[name])


@functools.lru_cache(maxsize=None)
def _tff2(name: str, nr: int):
    from gnark_tpu.fields import FIELDS
    from gnark_tpu.ff.pallas_fp2 import TFF2
    return TFF2(TFF(FIELDS[name]), nr)


def _tff_for(ff):
    """TFF for FF, TFF2 for FF2 — plus the flat row count and the
    (L, 1)/(2L, 1) b3 constant column builder."""
    from gnark_tpu.ec.fp2 import FF2
    if isinstance(ff, FF2):
        f = _tff2(ff.p.name, ff._nr_small)
        return f, f.nrows, (lambda b3: f.mont_col2(*b3))
    f = _tff(ff.p.name)
    return f, ff.n, f.mont_col


def _jac_double_t(f: TFF, X1, Y1, Z1):
    A = f.square(X1)
    B = f.square(Y1)
    C = f.square(B)
    t = f.square(f.add(X1, B))
    D = f.double(f.sub(f.sub(t, A), C))
    E = f.add(f.double(A), A)
    F = f.square(E)
    X3 = f.sub(F, f.double(D))
    Y3 = f.sub(f.mul(E, f.sub(D, X3)), f.mul_small(C, 8))
    Z3 = f.double(f.mul(Y1, Z1))
    return X3, Y3, Z3


def _jac_sel(f: TFF, cond, P, Q):
    return tuple(f.select(cond, a, b) for a, b in zip(P, Q))


def _jac_add_t(f: TFF, P, Q):
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    Z1Z1 = f.square(Z1)
    Z2Z2 = f.square(Z2)
    U1 = f.mul(X1, Z2Z2)
    U2 = f.mul(X2, Z1Z1)
    S1 = f.mul(f.mul(Y1, Z2), Z2Z2)
    S2 = f.mul(f.mul(Y2, Z1), Z1Z1)
    H = f.sub(U2, U1)
    r = f.double(f.sub(S2, S1))
    I = f.square(f.double(H))
    J = f.mul(H, I)
    V = f.mul(U1, I)
    X3 = f.sub(f.sub(f.square(r), J), f.double(V))
    Y3 = f.sub(f.mul(r, f.sub(V, X3)), f.double(f.mul(S1, J)))
    Z3 = f.mul(f.sub(f.sub(f.square(f.add(Z1, Z2)), Z1Z1), Z2Z2), H)
    R = (X3, Y3, Z3)

    inf1 = f.is_zero(Z1)
    inf2 = f.is_zero(Z2)
    x_eq = f.is_zero(H)
    y_eq = f.is_zero(r)
    both = ~inf1 & ~inf2
    T = X3.shape[1:]
    R = _jac_sel(f, both & x_eq & y_eq, _jac_double_t(f, X1, Y1, Z1), R)
    R = _jac_sel(f, both & x_eq & ~y_eq,
                 (f.ones(T), f.ones(T), f.zeros(T)), R)
    R = _jac_sel(f, inf1, Q, R)
    R = _jac_sel(f, inf2, P, R)
    return R


def _jac_add_mixed_t(f: TFF, P, x2, y2, inf2):
    X1, Y1, Z1 = P
    Z1Z1 = f.square(Z1)
    U2 = f.mul(x2, Z1Z1)
    S2 = f.mul(f.mul(y2, Z1), Z1Z1)
    H = f.sub(U2, X1)
    HH = f.square(H)
    I = f.mul_small(HH, 4)
    J = f.mul(H, I)
    r = f.double(f.sub(S2, Y1))
    V = f.mul(X1, I)
    X3 = f.sub(f.sub(f.square(r), J), f.double(V))
    Y3 = f.sub(f.mul(r, f.sub(V, X3)), f.double(f.mul(Y1, J)))
    Z3 = f.sub(f.sub(f.square(f.add(Z1, H)), Z1Z1), HH)
    R = (X3, Y3, Z3)

    inf1 = f.is_zero(Z1)
    x_eq = f.is_zero(H)
    y_eq = f.is_zero(r)
    both = ~inf1 & ~inf2
    T = X3.shape[1:]
    R = _jac_sel(f, both & x_eq & y_eq, _jac_double_t(f, X1, Y1, Z1), R)
    R = _jac_sel(f, both & x_eq & ~y_eq,
                 (f.ones(T), f.ones(T), f.zeros(T)), R)
    one = f.ones(T)
    zero = f.zeros(T)
    Qjac = (f.select(inf2, one, x2), f.select(inf2, one, y2),
            f.select(inf2, zero, one))
    R = _jac_sel(f, inf1, Qjac, R)
    R = _jac_sel(f, inf2, P, R)
    return R


# ---------------------------------------------------------------------------
# Renes-Costello complete projective formulas (a = 0 curves)
#
# Branchless complete group law in homogeneous (X : Y : Z) coordinates
# (Renes-Costello-Batina 2015, Algorithms 7-9 specialized to a = 0 /
# j-invariant-0 curves). Identity is (0 : 1 : 0). Every curve with a
# device MSM here (bn254/bls12-377/bls12-381/bw6-761/grumpkin G1) has
# a = 0, so these replace the Jacobian complete adds in the MSM bucket
# kernel: the Jacobian path pays for a full doubling branch plus select
# chains on EVERY add; these are single straight-line formulas.
#
# Cost discipline (measured in tools/mul_bench.py): all arithmetic is
# in the <= 2p lazy class (TFF.mul_lazy/add2p/sub2p/sop2 — no final
# conditional subtracts), the three output sums are fused 2-product
# CIOS calls, and the multiply by b3 = 3*b is a constant-OPERAND
# Montgomery mul with the (L, 1) column b3col = (3b * R mod p) —
# passed as a kernel input (Pallas kernels cannot capture array
# constants; build it with TFF.mont_col). Outputs are <= 2p; callers
# canonicalize at kernel boundaries with TFF.canon.
# ---------------------------------------------------------------------------

def _proj_add_t(f: TFF, P, Q, b3col):
    """Complete projective add, RC15 Algorithm 7 (a=0)."""
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    t0 = f.mul_lazy(X1, X2)
    t1 = f.mul_lazy(Y1, Y2)
    t2 = f.mul_lazy(Z1, Z2)
    t3 = f.sub2p(f.mul_lazy(f.add2p(X1, Y1), f.add2p(X2, Y2)),
                 f.add2p(t0, t1))
    t4 = f.sub2p(f.mul_lazy(f.add2p(Y1, Z1), f.add2p(Y2, Z2)),
                 f.add2p(t1, t2))
    Y3 = f.sub2p(f.mul_lazy(f.add2p(X1, Z1), f.add2p(X2, Z2)),
                 f.add2p(t0, t2))
    X3 = f.add2p(f.double2p(t0), t0)          # 3*t0
    t2 = f.mul_lazy(t2, b3col)
    Z3 = f.add2p(t1, t2)
    t1 = f.sub2p(t1, t2)
    Y3 = f.mul_lazy(Y3, b3col)
    X3_out = f.sop2(t3, t1, t4, f.neg2p(Y3))
    Y3_out = f.sop2(t1, Z3, Y3, X3)
    Z3_out = f.sop2(Z3, t4, X3, t3)
    return X3_out, Y3_out, Z3_out


def _proj_madd_t(f: TFF, P, x2, y2, b3col):
    """Complete MIXED projective add, RC15 Algorithm 8 (a=0).

    Q = (x2, y2) affine, assumed NOT infinity (MSM callers mask
    infinity/zero-digit lanes out of the bucket write instead)."""
    X1, Y1, Z1 = P
    t0 = f.mul_lazy(X1, x2)
    t1 = f.mul_lazy(Y1, y2)
    t3 = f.sub2p(f.mul_lazy(f.add2p(x2, y2), f.add2p(X1, Y1)),
                 f.add2p(t0, t1))
    t4 = f.add2p(f.mul_lazy(y2, Z1), Y1)
    Y3 = f.add2p(f.mul_lazy(x2, Z1), X1)
    X3 = f.add2p(f.double2p(t0), t0)          # 3*t0
    t2 = f.mul_lazy(Z1, b3col)
    Z3 = f.add2p(t1, t2)
    t1 = f.sub2p(t1, t2)
    Y3 = f.mul_lazy(Y3, b3col)
    X3_out = f.sop2(t3, t1, t4, f.neg2p(Y3))
    Y3_out = f.sop2(t1, Z3, Y3, X3)
    Z3_out = f.sop2(Z3, t4, X3, t3)
    return X3_out, Y3_out, Z3_out


def _proj_dbl_t(f: TFF, P, b3col):
    """Complete projective double, RC15 Algorithm 9 (a=0)."""
    X, Y, Z = P
    t0 = f.mul_lazy(Y, Y)
    Z3 = f.double2p(f.double2p(f.double2p(t0)))     # 8*Y^2
    t1 = f.mul_lazy(Y, Z)
    t2 = f.mul_lazy(f.mul_lazy(Z, Z), b3col)
    X3 = f.mul_lazy(t2, Z3)
    Y3 = f.add2p(t0, t2)
    Z3 = f.mul_lazy(t1, Z3)
    t2 = f.add2p(f.double2p(t2), t2)                # 3*t2
    t0 = f.sub2p(t0, t2)
    Y3 = f.add2p(X3, f.mul_lazy(t0, Y3))
    X3 = f.double2p(f.mul_lazy(t0, f.mul_lazy(X, Y)))
    return X3, Y3, Z3


# ---------------------------------------------------------------------------
# kernels (standard (n, L) layout at the boundary)
# ---------------------------------------------------------------------------

def _spec(L):
    return pl.BlockSpec((_T, L), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _const_spec(L):
    """(L, 1) constant column, same block for every grid step."""
    return pl.BlockSpec((L, 1), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)


def _bool_spec():
    return pl.BlockSpec((_T,), lambda i: (i,), memory_space=pltpu.VMEM)


def _interpret() -> bool:
    return jax.devices()[0].platform == "cpu"


def _pad_to_tile(arrs, n):
    padn = -n % _T
    if padn == 0:
        return arrs, n
    out = []
    for a in arrs:
        pad_shape = (padn,) + a.shape[1:]
        out.append(jnp.concatenate([a, jnp.zeros(pad_shape, a.dtype)], 0))
    return out, n + padn


@functools.partial(jax.jit, static_argnums=(0,))
def jac_add_p(ff: FF, P, Q):
    f = _tff(ff.p.name)
    L = ff.n
    n = P[0].shape[0]
    arrs, np_ = _pad_to_tile(list(P) + list(Q), n)

    def kernel(pcol, onecol, x1, y1, z1, x2, y2, z2, ox, oy, oz):
        fb = f.bind(pcol[:], onecol[:])
        R = _jac_add_t(fb, (x1[:].T, y1[:].T, z1[:].T),
                       (x2[:].T, y2[:].T, z2[:].T))
        ox[:], oy[:], oz[:] = R[0].T, R[1].T, R[2].T

    out = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((np_, L), jnp.uint32)] * 3,
        grid=(np_ // _T,),
        in_specs=[_const_spec(L)] * 2 + [_spec(L)] * 6,
        out_specs=[_spec(L)] * 3,
        interpret=_interpret(),
    )(*f.consts(), *arrs)
    return tuple(a[:n] for a in out)


@functools.partial(jax.jit, static_argnums=(0,))
def jac_add_mixed_p(ff: FF, P, A):
    f = _tff(ff.p.name)
    L = ff.n
    n = P[0].shape[0]
    x2, y2, inf2 = A
    inf2 = inf2.astype(jnp.uint32)
    arrs, np_ = _pad_to_tile(list(P) + [x2, y2], n)
    (inf2_p,), _ = _pad_to_tile([inf2[:, None]], n)

    def kernel(pcol, onecol, x1, y1, z1, px, py, pinf, ox, oy, oz):
        fb = f.bind(pcol[:], onecol[:])
        R = _jac_add_mixed_t(
            fb, (x1[:].T, y1[:].T, z1[:].T), px[:].T, py[:].T,
            pinf[:].T[0] != 0)
        ox[:], oy[:], oz[:] = R[0].T, R[1].T, R[2].T

    out = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((np_, L), jnp.uint32)] * 3,
        grid=(np_ // _T,),
        in_specs=[_const_spec(L)] * 2 + [_spec(L)] * 5 + [_spec(1)],
        out_specs=[_spec(L)] * 3,
        interpret=_interpret(),
    )(*f.consts(), *arrs, inf2_p)
    return tuple(a[:n] for a in out)


@functools.partial(jax.jit, static_argnums=(0, 1))
def proj_add_p(ff, b3, P, Q):
    """Batched complete projective add (RC15 Alg 7, a=0).

    P, Q: (X, Y, Z) arrays of shape (n, L) — for FF2 (G2 twists) the
    rows are FLAT stacked c0|c1 limbs (L = 2*ff.n) and b3 = 3*b2 as an
    int pair. Inputs may be <= 2p representatives; outputs canonical."""
    f, L, mkb3 = _tff_for(ff)
    n = P[0].shape[0]
    arrs, np_ = _pad_to_tile(list(P) + list(Q), n)

    def kernel(pcol, onecol, p2col, b3col, x1, y1, z1, x2, y2, z2,
               ox, oy, oz):
        fb = f.bind(pcol[:], onecol[:], p2col[:])
        R = _proj_add_t(fb, (x1[:].T, y1[:].T, z1[:].T),
                        (x2[:].T, y2[:].T, z2[:].T), b3col[:])
        R = tuple(fb.canon(a) for a in R)
        ox[:], oy[:], oz[:] = R[0].T, R[1].T, R[2].T

    out = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((np_, L), jnp.uint32)] * 3,
        grid=(np_ // _T,),
        in_specs=[_const_spec(L)] * 4 + [_spec(L)] * 6,
        out_specs=[_spec(L)] * 3,
        interpret=_interpret(),
    )(*f.consts3(), mkb3(b3), *arrs)
    return tuple(a[:n] for a in out)


@functools.partial(jax.jit, static_argnums=(0, 1))
def proj_double_p(ff, b3, P):
    """Batched complete projective double (RC15 Alg 9, a=0)."""
    f, L, mkb3 = _tff_for(ff)
    n = P[0].shape[0]
    arrs, np_ = _pad_to_tile(list(P), n)

    def kernel(pcol, onecol, p2col, b3col, x1, y1, z1, ox, oy, oz):
        fb = f.bind(pcol[:], onecol[:], p2col[:])
        R = _proj_dbl_t(fb, (x1[:].T, y1[:].T, z1[:].T), b3col[:])
        R = tuple(fb.canon(a) for a in R)
        ox[:], oy[:], oz[:] = R[0].T, R[1].T, R[2].T

    out = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((np_, L), jnp.uint32)] * 3,
        grid=(np_ // _T,),
        in_specs=[_const_spec(L)] * 4 + [_spec(L)] * 3,
        out_specs=[_spec(L)] * 3,
        interpret=_interpret(),
    )(*f.consts3(), mkb3(b3), *arrs)
    return tuple(a[:n] for a in out)


@functools.partial(jax.jit, static_argnums=(0,))
def jac_double_p(ff: FF, P):
    f = _tff(ff.p.name)
    L = ff.n
    n = P[0].shape[0]
    arrs, np_ = _pad_to_tile(list(P), n)

    def kernel(pcol, onecol, x1, y1, z1, ox, oy, oz):
        fb = f.bind(pcol[:], onecol[:])
        R = _jac_double_t(fb, x1[:].T, y1[:].T, z1[:].T)
        ox[:], oy[:], oz[:] = R[0].T, R[1].T, R[2].T

    out = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((np_, L), jnp.uint32)] * 3,
        grid=(np_ // _T,),
        in_specs=[_const_spec(L)] * 2 + [_spec(L)] * 3,
        out_specs=[_spec(L)] * 3,
        interpret=_interpret(),
    )(*f.consts(), *arrs)
    return tuple(a[:n] for a in out)
