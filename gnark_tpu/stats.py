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


def snippet(name, only_fields=None):
    """Register a snippet; only_fields restricts which stat fields it
    compiles under (gadgets with field-specific parameters)."""
    def deco(make):
        SNIPPETS[name] = (make, only_fields)
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


@snippet("hash/poseidon2", only_fields=("bn254_fr",))
def _poseidon2():
    from gnark_tpu.std.hash.poseidon2 import Poseidon2Gadget

    class C(Circuit):
        x: Secret
        y: Public

        def define(self, api):
            g = Poseidon2Gadget(api)
            api.assert_is_equal(g.hash([self.x, 1]), self.y)
    return C()


@snippet("std/lookup8", only_fields=("bn254_fr",))
def _lookup():
    from gnark_tpu.std.lookup import Table

    class C(Circuit):
        idx: Secret
        out: Public

        def define(self, api):
            t = Table(api)
            for i in range(8):
                t.insert(i * i)
            api.assert_is_equal(t.lookup(self.idx)[0], self.out)
    return C()


@snippet("std/rangecheck64_table", only_fields=("bn254_fr",))
def _rc64():
    from gnark_tpu.std import rangecheck

    class C(Circuit):
        x: Secret

        def define(self, api):
            rangecheck.checker(api).check(self.x, 64)
    return C()


@snippet("emulated/secp256k1_mul", only_fields=("bn254_fr",))
def _emul():
    from gnark_tpu.std.math import emulated as emu

    class C(Circuit):
        a: list[Secret]
        b: list[Secret]

        def __init__(self, **kw):
            self.a = [None] * emu.K
            self.b = [None] * emu.K
            super().__init__(**kw)

        def define(self, api):
            f = emu.EmulatedField(api, emu.SECP256K1_FP)
            f.mul(f.from_limb_vars(self.a), f.from_limb_vars(self.b))
    return C()


@snippet("std/lzss16", only_fields=("bn254_fr",))
def _lzss():
    from gnark_tpu.std.compress import lzss

    class C(Circuit):
        c: list[Secret]
        clen: Public

        def __init__(self, **kw):
            self.c = [None] * 16
            super().__init__(**kw)

        def define(self, api):
            lzss.decompress_circuit(api, self.c, self.clen, 16)
    return C()


@snippet("gkr/pow7x8", only_fields=("bn254_fr",))
def _gkr():
    from gnark_tpu.std import gkrapi

    class C(Circuit):
        xs: list[Secret]

        def __init__(self, **kw):
            self.xs = [None] * 8
            super().__init__(**kw)

        def define(self, api):
            g = gkrapi.GkrApi(api, 8)
            x = g.import_input(self.xs)
            w = g.named_gate("pow7", x)
            g.solve(w)
            g.verify()
    return C()


BUILDERS = {"r1cs": R1CSBuilder, "scs": SCSBuilder}
STAT_FIELDS = {"bn254_fr": fields.BN254_FR, "tinyfield": fields.TINYFIELD}


def collect() -> list[tuple]:
    rows = []
    for name in sorted(SNIPPETS):
        make, only = SNIPPETS[name]
        for fname, field in STAT_FIELDS.items():
            if only and fname not in only:
                continue
            for bname, bcls in BUILDERS.items():
                cs = compile_circuit(make(), field, builder_cls=bcls)
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
