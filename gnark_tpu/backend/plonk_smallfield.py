"""Small-field PLONK setup (reference backend/plonk/koalabear/setup.go
— the reference itself is setup-only: trace + permutation over a
31-bit field, the groundwork for small-field PLONK with FRI/hash-based
commitments instead of KZG).

Builds the PLONKish trace columns and the 3N permutation for an SCS
circuit over koalabear/babybear, plus their evaluation-domain
representations. No polynomial commitment: small fields have no
pairing; a hash-based PCS is the round-3+ follow-up."""

from __future__ import annotations

import dataclasses

from gnark_tpu import fields
from gnark_tpu.constraint import ConstraintSystem


def _next_pow2(n: int) -> int:
    p = 1
    while p < max(n, 1):
        p <<= 1
    return p


@dataclasses.dataclass
class SmallFieldTrace:
    field: object
    size: int                 # N
    generator: int            # domain generator
    coset_shift: int
    nb_public: int
    ql: list
    qr: list
    qm: list
    qo: list
    qk: list
    s1: list                  # sigma evaluations over the domain
    s2: list
    s3: list
    perm: list                # raw 3N permutation


def setup(cs: ConstraintSystem, field=fields.KOALABEAR) -> SmallFieldTrace:
    assert cs.kind == "scs", "plonk needs an SCS circuit"
    q = field.modulus
    assert q == cs.q, "constraint system field != small field"
    nb_pub = cs.nb_public
    N = _next_pow2(nb_pub + cs.nb_constraints)
    w = field.root_of_unity(N)
    u = field.generator % q

    ql = [0] * N; qr = [0] * N; qm = [0] * N; qo = [0] * N; qk = [0] * N
    for i in range(nb_pub):
        ql[i] = q - 1
    off = nb_pub
    for j, con in enumerate(cs.sparse):
        ql[off + j] = con.qL
        qr[off + j] = con.qR
        qm[off + j] = con.qM
        qo[off + j] = con.qO
        qk[off + j] = con.qC

    # permutation over 3N slots by variable cycles (setup.go
    # buildPermutation)
    lro = [0] * (3 * N)
    for i in range(nb_pub):
        lro[i] = i
    for j, con in enumerate(cs.sparse):
        lro[off + j] = con.xa
        lro[N + off + j] = con.xb
        lro[2 * N + off + j] = con.xo
    nb_vars = cs.nb_wires
    cycle_prev = [-1] * nb_vars
    perm = [-1] * (3 * N)
    first = [-1] * nb_vars
    for s in range(3 * N):
        v = lro[s]
        if s >= len(lro):
            break
        if not (0 <= v < nb_vars):
            continue
        if first[v] == -1:
            first[v] = s
        else:
            perm[s] = cycle_prev[v]
        cycle_prev[v] = s
    for v in range(nb_vars):
        if first[v] != -1:
            perm[first[v]] = cycle_prev[v]
    for s in range(3 * N):
        if perm[s] == -1:
            perm[s] = s

    wpow = [1] * N
    for i in range(1, N):
        wpow[i] = wpow[i - 1] * w % q

    def evalpoint(j):
        return pow(u, j // N, q) * wpow[j % N] % q

    s1 = [evalpoint(perm[i]) for i in range(N)]
    s2 = [evalpoint(perm[N + i]) for i in range(N)]
    s3 = [evalpoint(perm[2 * N + i]) for i in range(N)]
    return SmallFieldTrace(field=field, size=N, generator=w,
                           coset_shift=u, nb_public=nb_pub,
                           ql=ql, qr=qr, qm=qm, qo=qo, qk=qk,
                           s1=s1, s2=s2, s3=s3, perm=perm)
