"""Gadget stdlib tests: MiMC, Merkle, selectors, rangecheck.

Differential pattern: every gadget is checked against its host
implementation via the test engine AND the real R1CS solver."""

import pytest

from gnark_tpu import fields
from gnark_tpu.constraint import SolverError, solve
from gnark_tpu.frontend import Circuit, Public, Secret, compile_circuit, witness
from gnark_tpu.frontend.scs import SCSBuilder
from gnark_tpu.std.hash.mimc import MiMC, MiMCGadget, mimc_hash
from gnark_tpu.std import merkle, rangecheck, selector
from gnark_tpu.test_engine import is_solved

F = fields.BN254_FR


class MimcCircuit(Circuit):
    pre: Secret
    h: Public

    def define(self, api):
        g = MiMCGadget(api)
        g.write(self.pre)
        api.assert_is_equal(g.sum(), self.h)


@pytest.mark.parametrize("builder", [None, SCSBuilder])
def test_mimc_gadget_matches_host(builder):
    pre = 12345678901234567890
    h = mimc_hash([pre])
    kw = {"builder_cls": builder} if builder else {}
    cs = compile_circuit(MimcCircuit(), F, **kw)
    pub, sec = witness(MimcCircuit(pre=pre, h=h), cs)
    solve(cs, pub, sec)
    with pytest.raises(SolverError):
        pub2, sec2 = witness(MimcCircuit(pre=pre, h=h + 1), cs)
        solve(cs, pub2, sec2)
    assert is_solved(MimcCircuit(pre=pre, h=h), F)
    assert not is_solved(MimcCircuit(pre=pre, h=h + 1), F)


def test_mimc_multiblock():
    a, b, c = 11, 22, 33
    h1 = MiMC().write(a, b, c).sum()
    h2 = MiMC().write(a).write(b, c).sum()
    assert h1 == h2
    assert h1 != mimc_hash([a, b])


class MerkleCircuit(Circuit):
    root: Public
    leaf: Secret
    path: list[Secret]
    dirs: list[Secret]

    def __init__(self, depth=3, **kw):
        self.path = [None] * depth
        self.dirs = [None] * depth
        super().__init__(**kw)

    def define(self, api):
        merkle.verify_proof(api, self.root, self.leaf, self.path, self.dirs)


def test_merkle():
    leaves = [mimc_hash([i + 100]) for i in range(8)]
    root, proof = merkle.host_merkle_root(leaves)
    path, dirs = proof(5)
    c = MerkleCircuit(root=root, leaf=leaves[5])
    c.path, c.dirs = path, dirs
    assert is_solved(c, F)
    cs = compile_circuit(MerkleCircuit(), F)
    pub, sec = witness(c, cs)
    solve(cs, pub, sec)
    # wrong leaf fails
    bad = MerkleCircuit(root=root, leaf=leaves[4])
    bad.path, bad.dirs = path, dirs
    assert not is_solved(bad, F)


class MuxCircuit(Circuit):
    sel: Secret
    out: Public

    def define(self, api):
        api.assert_is_equal(selector.mux(api, self.sel, 10, 20, 30, 40),
                            self.out)


def test_mux():
    for i, v in enumerate([10, 20, 30, 40]):
        assert is_solved(MuxCircuit(sel=i, out=v), F)
        cs = compile_circuit(MuxCircuit(), F)
        pub, sec = witness(MuxCircuit(sel=i, out=v), cs)
        solve(cs, pub, sec)
    assert not is_solved(MuxCircuit(sel=4, out=10), F)
    assert not is_solved(MuxCircuit(sel=1, out=10), F)


class MapCircuit(Circuit):
    k: Secret
    v: Public

    def define(self, api):
        api.assert_is_equal(
            selector.map_lookup(api, self.k, [5, 7, 9], [50, 70, 90]),
            self.v)


def test_map_lookup():
    assert is_solved(MapCircuit(k=7, v=70), F)
    assert not is_solved(MapCircuit(k=8, v=70), F)


class RangeCircuit(Circuit):
    x: Secret

    def define(self, api):
        rangecheck.check(api, self.x, 10)
        rangecheck.check_less_than(api, self.x, 1000)


def test_rangecheck():
    assert is_solved(RangeCircuit(x=999), F)
    assert not is_solved(RangeCircuit(x=1000), F)
    assert not is_solved(RangeCircuit(x=1024), F)
    cs = compile_circuit(RangeCircuit(), F)
    pub, sec = witness(RangeCircuit(x=999), cs)
    solve(cs, pub, sec)


class SliceCircuit(Circuit):
    pivot: Secret
    total: Public

    def define(self, api):
        # sum of values[1:pivot]
        s = selector.slice_sum(api, [10, 20, 30, 40, 50], 1, self.pivot)
        api.assert_is_equal(s, self.total)


def test_slice_sum():
    assert is_solved(SliceCircuit(pivot=4, total=20 + 30 + 40), F)
    assert is_solved(SliceCircuit(pivot=1, total=0), F)
    assert not is_solved(SliceCircuit(pivot=4, total=0), F)
    assert not is_solved(SliceCircuit(pivot=6, total=0), F)  # out of range
    cs = compile_circuit(SliceCircuit(), F)
    pub, sec = witness(SliceCircuit(pivot=4, total=90), cs)
    solve(cs, pub, sec)


class LogDerivRange(Circuit):
    xs: list[Secret]

    def __init__(self, n=4, **kw):
        self.xs = [None] * n
        super().__init__(**kw)

    def define(self, api):
        rangecheck.check_many_logderiv(api, self.xs, 4)


def test_rangecheck_logderiv():
    ok = LogDerivRange()
    ok.xs = [0, 3, 15, 7]
    assert is_solved(ok, F)
    cs = compile_circuit(LogDerivRange(), F)
    pub, sec = witness(ok, cs)
    solve(cs, pub, sec)
    bad = LogDerivRange()
    bad.xs = [0, 3, 16, 7]
    assert not is_solved(bad, F)
