"""Emulated BN254 tower fields: differential vs the host ExtField."""

import random

import pytest

from gnark_tpu import fields
from gnark_tpu.std.algebra import fields_bn254 as fb
from gnark_tpu.std.math import emulated as emu
from gnark_tpu.test_engine import is_solved
from gnark_tpu.frontend import Circuit, Secret

F = fields.BN254_FR
RNG = random.Random(2024)
P = fb.P_MOD


def rand_fp12():
    return tuple((RNG.randrange(P), RNG.randrange(P)) for _ in range(6))


def flatten(e):
    out = []
    for c0, c1 in e:
        out += [c0, c1]
    return out


def limbs(v):
    return [(v >> (emu.B * i)) & emu.MASK for i in range(emu.K)]


def make_circuit(op, n_in):
    class C(Circuit):
        ins: list[Secret]
        out: list[Secret]

        def __init__(self, **kw):
            self.ins = [None] * (12 * emu.K * n_in)
            self.out = [None] * (12 * emu.K)
            super().__init__(**kw)

        def define(self, api):
            f12 = fb.EF12(api)
            fe = f12.fe
            args = []
            for t in range(n_in):
                base = 12 * emu.K * t
                coords = [fe.from_limb_vars(
                    self.ins[base + emu.K * i: base + emu.K * (i + 1)])
                    for i in range(12)]
                args.append(f12.from_vars(coords))
            got = getattr(f12, op)(*args)
            coords = [fe.from_limb_vars(
                self.out[emu.K * i: emu.K * (i + 1)]) for i in range(12)]
            want = f12.from_vars(coords)
            f12.assert_eq(got, want)
    return C


def assign(C, ins_elems, out_elem):
    inst = C()
    flat = []
    for e in ins_elems:
        for v in flatten(e):
            flat += limbs(v)
    inst.ins = flat
    outf = []
    for v in flatten(out_elem):
        outf += limbs(v)
    inst.out = outf
    return inst


HOST = fb._host_ext()


@pytest.mark.parametrize("op,n_in,hostfn", [
    ("mul", 2, lambda a, b: HOST.mul(a, b)),
    ("sqr", 1, lambda a: HOST.sqr(a)),
    ("inv", 1, lambda a: HOST.inv(a)),
    ("frob", 1, None),
    ("frob2", 1, None),
    ("conj6", 1, None),
])
def test_ef12_ops(op, n_in, hostfn):
    ins = [rand_fp12() for _ in range(n_in)]
    if hostfn is None:
        n = {"frob": 1, "frob2": 2, "conj6": 6}[op]
        want = _host_pow_frob(ins[0], n)
    else:
        want = hostfn(*ins)
    C = make_circuit(op, n_in)
    assert is_solved(assign(C, ins, want), F), op
    bad = list(want)
    bad[0] = ((bad[0][0] + 1) % P, bad[0][1])
    assert not is_solved(assign(C, ins, tuple(bad)), F), op


def _host_pow_frob(e, n):
    """e^(p^n) computed on the host by exponentiation (oracle for the
    coefficient-wise circuit Frobenius)."""
    return HOST.pow(e, fb.P_MOD ** n)


def test_ef12_sparse013():
    a = rand_fp12()
    l0 = (RNG.randrange(P), 0)
    l1 = (RNG.randrange(P), RNG.randrange(P))
    l3 = (RNG.randrange(P), RNG.randrange(P))
    sparse = (l0, l1, HOST.base.zero, l3, HOST.base.zero, HOST.base.zero)
    want = HOST.mul(a, sparse)

    class C(Circuit):
        ins: list[Secret]
        out: list[Secret]

        def __init__(self, **kw):
            self.ins = [None] * (emu.K * (12 + 6))
            self.out = [None] * (12 * emu.K)
            super().__init__(**kw)

        def define(self, api):
            f12 = fb.EF12(api)
            fe = f12.fe
            coords = [fe.from_limb_vars(
                self.ins[emu.K * i: emu.K * (i + 1)]) for i in range(18)]
            a_e = f12.from_vars(coords[:12])
            el0 = (coords[12], coords[13])
            el1 = (coords[14], coords[15])
            el3 = (coords[16], coords[17])
            got = f12.mul_sparse013(a_e, el0, el1, el3)
            ocoords = [fe.from_limb_vars(
                self.out[emu.K * i: emu.K * (i + 1)]) for i in range(12)]
            f12.assert_eq(got, f12.from_vars(ocoords))

    inst = C()
    flat = []
    for v in flatten(a) + [l0[0], l0[1], l1[0], l1[1], l3[0], l3[1]]:
        flat += limbs(v)
    inst.ins = flat
    outf = []
    for v in flatten(want):
        outf += limbs(v)
    inst.out = outf
    assert is_solved(inst, F)


def test_ef2_ops():
    a = (RNG.randrange(P), RNG.randrange(P))
    b = (RNG.randrange(P), RNG.randrange(P))
    f2h = HOST.base
    checks = {
        "mul": f2h.mul(a, b),
        "add": f2h.add(a, b),
        "sub": f2h.sub(a, b),
        "inv_a": f2h.inv(a),
        "xi_a": f2h.mul(a, fb.XI),
    }

    class C(Circuit):
        ins: list[Secret]
        out: list[Secret]

        def __init__(self, **kw):
            self.ins = [None] * (4 * emu.K)
            self.out = [None] * (10 * emu.K)
            super().__init__(**kw)

        def define(self, api):
            f2 = fb.EF2(api)
            fe = f2.fe
            cs = [fe.from_limb_vars(
                self.ins[emu.K * i: emu.K * (i + 1)]) for i in range(4)]
            ea, eb = (cs[0], cs[1]), (cs[2], cs[3])
            outs = [fe.from_limb_vars(
                self.out[emu.K * i: emu.K * (i + 1)]) for i in range(10)]
            f2.assert_eq(f2.mul(ea, eb), (outs[0], outs[1]))
            f2.assert_eq(f2.add(ea, eb), (outs[2], outs[3]))
            f2.assert_eq(f2.sub(ea, eb), (outs[4], outs[5]))
            f2.assert_eq(f2.inv(ea), (outs[6], outs[7]))
            f2.assert_eq(f2.mul_by_xi(ea), (outs[8], outs[9]))

    inst = C()
    flat = []
    for v in (a[0], a[1], b[0], b[1]):
        flat += limbs(v)
    inst.ins = flat
    outf = []
    for key in ("mul", "add", "sub", "inv_a", "xi_a"):
        v = checks[key]
        outf += limbs(v[0]) + limbs(v[1])
    inst.out = outf
    assert is_solved(inst, F)
