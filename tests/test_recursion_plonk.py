"""In-circuit PLONK recursion: BLS12-377 recursion-friendly proofs
verified inside BW6-761 circuits (reference std/recursion/plonk)."""

import random

import pytest

from gnark_tpu import fields
from gnark_tpu.backend import kzg, plonk
from gnark_tpu.frontend import Circuit, Public, Secret, compile_circuit, \
    witness
from gnark_tpu.frontend.scs import SCSBuilder
from gnark_tpu.std.recursion.plonk import (assert_proof_plonk,
                                           proof_witness_plonk)
from gnark_tpu.test_engine import is_solved

F_OUT = fields.BW6_761_FR


class _Cubic(Circuit):
    x: Secret
    y: Public

    def define(self, api):
        x3 = api.mul(self.x, self.x, self.x)
        api.assert_is_equal(api.add(x3, self.x, 5), self.y)


@pytest.fixture(scope="module")
def inner():
    cs = compile_circuit(_Cubic(), fields.BLS12_377_FR,
                         builder_cls=SCSBuilder)
    srs = kzg.setup_srs("bls12_377", 64, rng=random.Random(31))
    pk, vk = plonk.setup(cs, srs)
    pub, sec = witness(_Cubic(x=3, y=35), cs)
    proof = plonk.prove(cs, pk, pub, sec, rng=random.Random(32),
                        recursion_friendly=True)
    assert plonk.verify(proof, vk, pub, recursion_friendly=True)
    return vk, proof


class _Outer(Circuit):
    pts: list[Secret]
    claimed: list[Secret]
    zu: Secret
    inner_y: Public

    ivk = None

    def __init__(self, **kw):
        self.pts = [None] * 18          # 9 points, no qcp
        self.claimed = [None] * 6
        super().__init__(**kw)

    def define(self, api):
        pv = dict(pts=self.pts, claimed=self.claimed, zu=self.zu)
        assert_proof_plonk(api, type(self).ivk, pv, [self.inner_y])


@pytest.mark.slow
def test_in_circuit_plonk_verify(inner):
    vk, proof = inner
    _Outer.ivk = vk
    w = proof_witness_plonk(proof)
    good = _Outer(zu=w["zu"], inner_y=35)
    good.pts, good.claimed = w["pts"], w["claimed"]
    assert is_solved(good, F_OUT)
    # wrong public input
    bad = _Outer(zu=w["zu"], inner_y=36)
    bad.pts, bad.claimed = w["pts"], w["claimed"]
    assert not is_solved(bad, F_OUT)
    # tampered claimed evaluation
    bad2 = _Outer(zu=w["zu"], inner_y=35)
    bad2.pts = w["pts"]
    bad2.claimed = [w["claimed"][0] + 1] + w["claimed"][1:]
    assert not is_solved(bad2, F_OUT)
    # tampered proof point
    bad3 = _Outer(zu=w["zu"], inner_y=35)
    bad3.pts = [w["pts"][0] + 1] + w["pts"][1:]
    bad3.claimed = w["claimed"]
    assert not is_solved(bad3, F_OUT)


# -- emulated variant: BN254 PLONK self-recursion -----------------------------

class _OuterEmu(Circuit):
    pt_limbs: list[Secret]
    claimed: list[Secret]
    zu: Secret
    inner_y: Public

    ivk = None

    def __init__(self, **kw):
        from gnark_tpu.std.math import emulated as emu
        self.pt_limbs = [None] * (18 * emu.K)   # 9 points, no qcp
        self.claimed = [None] * 6
        super().__init__(**kw)

    def define(self, api):
        from gnark_tpu.std.recursion.plonk import assert_proof_plonk_bn254
        pv = dict(pt_limbs=self.pt_limbs, claimed=self.claimed,
                  zu=self.zu)
        assert_proof_plonk_bn254(api, type(self).ivk, pv, [self.inner_y])


@pytest.fixture(scope="module")
def inner_bn254():
    cs = compile_circuit(_Cubic(), fields.BN254_FR,
                         builder_cls=SCSBuilder)
    srs = kzg.setup_srs("bn254", 64, rng=random.Random(41))
    pk, vk = plonk.setup(cs, srs)
    pub, sec = witness(_Cubic(x=3, y=35), cs)
    proof = plonk.prove(cs, pk, pub, sec, rng=random.Random(42),
                        recursion_friendly="self")
    assert plonk.verify(proof, vk, pub, recursion_friendly="self")
    return vk, proof


@pytest.mark.slow
def test_in_circuit_plonk_verify_emulated(inner_bn254):
    """BN254 PLONK proof verified by the EMULATED in-circuit verifier
    (self-recursion: native scalar algebra, emulated pairing) —
    reference std/recursion/plonk/verifier.go with sw_bn254."""
    from gnark_tpu.std.recursion.plonk import proof_witness_plonk_bn254
    vk, proof = inner_bn254
    _OuterEmu.ivk = vk
    w = proof_witness_plonk_bn254(proof)
    good = _OuterEmu(zu=w["zu"], inner_y=35)
    good.pt_limbs, good.claimed = w["pt_limbs"], w["claimed"]
    assert is_solved(good, fields.BN254_FR)
    # wrong public input
    bad = _OuterEmu(zu=w["zu"], inner_y=36)
    bad.pt_limbs, bad.claimed = w["pt_limbs"], w["claimed"]
    assert not is_solved(bad, fields.BN254_FR)
    # tampered claimed evaluation
    bad2 = _OuterEmu(zu=w["zu"], inner_y=35)
    bad2.pt_limbs = w["pt_limbs"]
    bad2.claimed = [w["claimed"][0] + 1] + w["claimed"][1:]
    assert not is_solved(bad2, fields.BN254_FR)
