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


def snippet(name, only_fields=None, heavy=False, gnark=None):
    """Register a snippet; only_fields restricts which stat fields it
    compiles under (gadgets with field-specific parameters).
    heavy=True: collected only by the slow-tier stats test (expensive
    gadget economics: emulated muls, pairings, hashes, signatures).
    gnark: (constraints, wires) of the closest reference row in
    internal/stats/latest_stats.csv (bn254/groth16), recorded beside
    ours so >2x blowups are visible."""
    def deco(make):
        SNIPPETS[name] = (make, only_fields, heavy, gnark)
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


@snippet("api/is_zero", gnark=(2, 2))
def _iszero():
    class C(Circuit):
        x: Secret

        def define(self, api):
            api.is_zero(self.x)
    return C()


@snippet("api/assert_is_less_or_equal_const", gnark=(587, 353))
def _leq():
    class C(Circuit):
        x: Secret

        def define(self, api):
            api.assert_is_less_or_equal(self.x, 255)
    return C()


@snippet("api/assert_is_crumb", gnark=(3, 2))
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


@snippet("hash/mimc", gnark=(330, 330))
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


@snippet("emulated/secp256k1_mul", only_fields=("bn254_fr",),
          gnark=(1036, 1889))
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


# -- round-4 breadth: expensive-gadget economics (VERDICT #10;
# reference internal/stats/latest_stats.csv rows cited per snippet) ---------

@snippet("api/lookup2", gnark=(5, 3))
def _lookup2():
    class C(Circuit):
        b0: Secret
        b1: Secret

        def define(self, api):
            api.lookup2(self.b0, self.b1, 11, 22, 33, 55)
    return C()


@snippet("api/cmp")
def _cmp():
    class C(Circuit):
        a: Secret
        b: Secret

        def define(self, api):
            api.cmp(self.a, self.b)
    return C()


@snippet("api/div_inverse")
def _div_inv():
    class C(Circuit):
        a: Secret
        b: Secret

        def define(self, api):
            api.assert_is_equal(api.div(self.a, self.b),
                                api.mul(self.a, api.inverse(self.b)))
    return C()


@snippet("api/assert_is_less_or_equal_var",
         only_fields=("bn254_fr",), gnark=(1523, 1367))
def _aisle_var():
    class C(Circuit):
        a: Secret
        b: Secret

        def define(self, api):
            api.assert_is_less_or_equal(self.a, self.b)
    return C()


@snippet("math/to_binary254", only_fields=("bn254_fr",),
         gnark=(508, 353))
def _tobin254():
    class C(Circuit):
        x: Secret

        def define(self, api):
            api.to_binary(self.x, 254)
    return C()


@snippet("selector/mux4", gnark=(6, 5))
def _mux4():
    from gnark_tpu.std import selector

    class C(Circuit):
        s: Secret

        def define(self, api):
            selector.mux(api, self.s, 1, 2, 3, 4)
    return C()


@snippet("math/bitslice64", only_fields=("bn254_fr",))
def _bitslice():
    from gnark_tpu.std.math import bitslice

    class C(Circuit):
        x: Secret

        def define(self, api):
            bitslice.partition(api, self.x, 32, 64)
    return C()


@snippet("std/fiatshamir", only_fields=("bn254_fr",))
def _fs():
    from gnark_tpu.std.fiatshamir import Transcript

    class C(Circuit):
        x: Secret

        def define(self, api):
            ts = Transcript(api, ["a", "b"])
            ts.bind("a", self.x)
            ts.compute_challenge("a")
            ts.compute_challenge("b")
    return C()


@snippet("std/multicommit2", only_fields=("bn254_fr",))
def _mc2():
    from gnark_tpu.std import multicommit

    class C(Circuit):
        x: Secret
        y: Secret

        def define(self, api):
            def cb(api_, c):
                api_.assert_is_different(c, 0)
            multicommit.with_commitment(api, cb, self.x, self.y)
    return C()


@snippet("emulated/secp256k1_add", only_fields=("bn254_fr",))
def _emu_add():
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
            x = f.from_limb_vars(self.a)
            y = f.from_limb_vars(self.b)
            f.reduce_strict(f.add(x, y))
    return C()


# -- heavy tier (slow-test collection only) ---------------------------------

@snippet("signature/eddsa_verify", only_fields=("bn254_fr",),
         heavy=True)
def _eddsa():
    from gnark_tpu.std.signature import eddsa

    class C(Circuit):
        px: Secret
        py: Secret
        m: Secret
        rx: Secret
        ry: Secret
        s: Secret

        def define(self, api):
            eddsa.verify_gadget(api, (self.px, self.py), self.m,
                                (self.rx, self.ry), self.s)
    return C()


@snippet("emulated/secp256k1_scalar_mul", only_fields=("bn254_fr",),
         heavy=True, gnark=(107536, 163231))
def _emu_smul():
    from gnark_tpu.std.algebra import sw_emulated as sw
    from gnark_tpu.std.math import emulated as emu

    class C(Circuit):
        x: list[Secret]
        y: list[Secret]
        s: list[Secret]

        def __init__(self, **kw):
            self.x = [None] * emu.K
            self.y = [None] * emu.K
            self.s = [None] * emu.K
            super().__init__(**kw)

        def define(self, api):
            cur = sw.EmulatedCurve(api, sw.SECP256K1)
            f = cur.f
            P = (f.from_limb_vars(self.x), f.from_limb_vars(self.y))
            cur.scalar_mul(P, self.s)   # GLV (point.go scalarMulGLV)
    return C()


@snippet("signature/ecdsa_secp256k1", only_fields=("bn254_fr",),
         heavy=True)
def _ecdsa():
    from gnark_tpu.std.algebra import sw_emulated as sw
    from gnark_tpu.std.math import emulated as emu

    class C(Circuit):
        qx: list[Secret]
        qy: list[Secret]
        h: list[Secret]
        r: list[Secret]
        s: list[Secret]

        def __init__(self, **kw):
            for n in ("qx", "qy", "h", "r", "s"):
                setattr(self, n, [None] * emu.K)
            super().__init__(**kw)

        def define(self, api):
            f = emu.EmulatedField(api, sw.SECP256K1.fp)
            pub = (f.from_limb_vars(self.qx), f.from_limb_vars(self.qy))
            sw.ecdsa_verify(api, sw.SECP256K1, pub, self.h, self.r,
                            self.s)
    return C()


@snippet("hash/sha256_block", only_fields=("bn254_fr",), heavy=True)
def _sha256():
    from gnark_tpu.std.hash import sha256 as sha

    class C(Circuit):
        ws: list[Secret]

        def __init__(self, **kw):
            self.ws = [None] * 16
            super().__init__(**kw)

        def define(self, api):
            sha.sha256_of_words(api, [self.ws])
    return C()


BUILDERS = {"r1cs": R1CSBuilder, "scs": SCSBuilder}
STAT_FIELDS = {"bn254_fr": fields.BN254_FR, "tinyfield": fields.TINYFIELD}


def collect(heavy: bool = False) -> list[tuple]:
    rows = []
    for name in sorted(SNIPPETS):
        make, only, is_heavy, _g = SNIPPETS[name]
        if is_heavy != heavy:
            continue
        for fname, field in STAT_FIELDS.items():
            if only and fname not in only:
                continue
            for bname, bcls in BUILDERS.items():
                cs = compile_circuit(make(), field, builder_cls=bcls)
                rows.append((name, fname, bname, cs.nb_constraints,
                             cs.nb_wires))
    return rows


def gnark_comparison(rows) -> list[tuple]:
    """(snippet, ours, gnark, ratio) for snippets with a pinned
    reference count (bn254 r1cs rows)."""
    out = []
    by_key = {(r[0], r[1], r[2]): r[3] for r in rows}
    for name, (make, only, is_heavy, g) in SNIPPETS.items():
        if g is None:
            continue
        ours = by_key.get((name, "bn254_fr", "r1cs"))
        if ours is not None:
            out.append((name, ours, g[0], ours / g[0]))
    return out


def to_csv(rows) -> str:
    buf = _io.StringIO()
    w = csv.writer(buf, lineterminator="\n")
    w.writerow(["snippet", "field", "builder", "constraints", "wires"])
    for r in rows:
        w.writerow(r)
    return buf.getvalue()
