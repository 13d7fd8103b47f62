"""Constraint-count regression (reference internal/stats).

A registry of named snippet circuits; `collect()` compiles each across
fields x builders and reports (nbConstraints, nbWires). The pinned CSV
(tests/data/stats.csv) fails tests on drift — the reference pins ~110
snippets x 4 curves x 2 backends the same way (latest_stats.csv,
stats.go:128-161).
"""

from __future__ import annotations

import csv
import io as _io

from gnark_tpu import fields
from gnark_tpu.frontend import Circuit, Public, Secret, compile_circuit
from gnark_tpu.frontend.r1cs import R1CSBuilder
from gnark_tpu.frontend.scs import SCSBuilder

SNIPPETS: dict = {}


def snippet(name):
    def deco(make):
        SNIPPETS[name] = make
        return make
    return deco


# -- snippet circuits (api/* namespace mirrors the reference's list) --------

@snippet("api/cubic")
def _cubic():
    class C(Circuit):
        x: Secret
        y: Public

        def define(self, api):
            api.assert_is_equal(api.add(api.mul(self.x, self.x, self.x),
                                        self.x, 5), self.y)
    return C()


@snippet("api/to_binary64")
def _tobin():
    class C(Circuit):
        x: Secret

        def define(self, api):
            api.to_binary(self.x, 64)
    return C()


@snippet("api/is_zero")
def _iszero():
    class C(Circuit):
        x: Secret

        def define(self, api):
            api.is_zero(self.x)
    return C()


@snippet("api/assert_is_less_or_equal_const")
def _leq():
    class C(Circuit):
        x: Secret

        def define(self, api):
            api.assert_is_less_or_equal(self.x, 255)
    return C()


@snippet("api/assert_is_crumb")
def _crumb():
    class C(Circuit):
        x: Secret

        def define(self, api):
            api.assert_is_crumb(self.x)
    return C()


@snippet("api/select")
def _select():
    class C(Circuit):
        c: Secret
        a: Secret
        b: Secret

        def define(self, api):
            api.select(self.c, self.a, self.b)
    return C()


@snippet("api/xor_and_or")
def _bools():
    class C(Circuit):
        a: Secret
        b: Secret

        def define(self, api):
            api.xor(self.a, self.b)
            api.and_(self.a, self.b)
            api.or_(self.a, self.b)
    return C()


@snippet("hash/mimc")
def _mimc():
    from gnark_tpu.std.hash.mimc import MiMCGadget

    class C(Circuit):
        x: Secret

        def define(self, api):
            MiMCGadget(api).write(self.x).sum()
    return C()


@snippet("std/merkle8")
def _merkle():
    from gnark_tpu.std import merkle

    class C(Circuit):
        root: Public
        leaf: Secret
        path: list[Secret]
        dirs: list[Secret]

        def __init__(self, **kw):
            self.path = [None] * 3
            self.dirs = [None] * 3
            super().__init__(**kw)

        def define(self, api):
            merkle.verify_proof(api, self.root, self.leaf, self.path,
                                self.dirs)
    return C()


BUILDERS = {"r1cs": R1CSBuilder, "scs": SCSBuilder}
STAT_FIELDS = {"bn254_fr": fields.BN254_FR, "tinyfield": fields.TINYFIELD}


def collect() -> list[tuple]:
    rows = []
    for name in sorted(SNIPPETS):
        for fname, field in STAT_FIELDS.items():
            for bname, bcls in BUILDERS.items():
                cs = compile_circuit(SNIPPETS[name](), field,
                                     builder_cls=bcls)
                rows.append((name, fname, bname, cs.nb_constraints,
                             cs.nb_wires))
    return rows


def to_csv(rows) -> str:
    buf = _io.StringIO()
    w = csv.writer(buf, lineterminator="\n")
    w.writerow(["snippet", "field", "builder", "constraints", "wires"])
    for r in rows:
        w.writerow(r)
    return buf.getvalue()
