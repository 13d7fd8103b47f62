"""BLS signatures: host scheme + in-circuit verification."""

import random

import pytest

from gnark_tpu import fields
from gnark_tpu.frontend import Circuit, Public, Secret
from gnark_tpu.std.signature import bls
from gnark_tpu.std.math import emulated as emu
from gnark_tpu.test_engine import is_solved

RNG = random.Random(606)


@pytest.mark.parametrize("curve", ["bn254", "bls12_377", "bls12_381"])
def test_bls_host(curve):
    sk, pk = bls.keygen(curve, RNG)
    msg = b"hello bls " + curve.encode()
    sig = bls.sign(curve, sk, msg)
    assert bls.verify(curve, pk, msg, sig)
    assert not bls.verify(curve, pk, msg + b"!", sig)
    sk2, pk2 = bls.keygen(curve, RNG)
    assert not bls.verify(curve, pk2, msg, sig)


@pytest.mark.slow
def test_bls_circuit_377():
    sk, pk = bls.keygen("bls12_377", RNG)
    msg = b"in-circuit bls"
    sig = bls.sign("bls12_377", sk, msg)
    hm = bls.hash_to_g1("bls12_377", msg)

    class C(Circuit):
        sx: Secret
        sy: Secret
        px0: Public
        px1: Public
        py0: Public
        py1: Public

        def define(self, api):
            bls.assert_verify_377(
                api, (self.sx, self.sy),
                ((self.px0, self.px1), (self.py0, self.py1)),
                (hm[0], hm[1]))

    good = C(sx=sig[0], sy=sig[1], px0=pk[0][0], px1=pk[0][1],
             py0=pk[1][0], py1=pk[1][1])
    assert is_solved(good, fields.BW6_761_FR)
    bad = C(sx=sig[0], sy=sig[1], px0=pk[0][0], px1=pk[0][1],
            py0=pk[1][1], py1=pk[1][0])
    assert not is_solved(bad, fields.BW6_761_FR)


@pytest.mark.slow
def test_bls_circuit_bn254_emulated():
    sk, pk = bls.keygen("bn254", RNG)
    msg = b"emulated bls"
    sig = bls.sign("bn254", sk, msg)
    hm = bls.hash_to_g1("bn254", msg)

    def limbs(v):
        return [(v >> (emu.B * i)) & emu.MASK for i in range(emu.K)]

    class C(Circuit):
        ins: list[Secret]

        def __init__(self, **kw):
            self.ins = [None] * (8 * emu.K)
            super().__init__(**kw)

        def define(self, api):
            from gnark_tpu.std.algebra.pairing_bn254 import G2Point
            f = emu.EmulatedField(api, emu.BN254_FP_EMU)
            els = [f.from_limb_vars(self.ins[emu.K * i:emu.K * (i + 1)])
                   for i in range(8)]
            sig_pt = (els[0], els[1])
            pk_q = G2Point((els[2], els[3]), (els[4], els[5]))
            hm_pt = (els[6], els[7])
            bls.assert_verify_bn254(api, sig_pt, pk_q, hm_pt)

    flat = (limbs(sig[0]) + limbs(sig[1]) + limbs(pk[0][0])
            + limbs(pk[0][1]) + limbs(pk[1][0]) + limbs(pk[1][1])
            + limbs(hm[0]) + limbs(hm[1]))
    good = C()
    good.ins = flat
    assert is_solved(good, fields.BN254_FR)
    other = bls.hash_to_g1("bn254", b"other msg")
    bad = C()
    bad.ins = flat[:6 * emu.K] + limbs(other[0]) + limbs(other[1])
    assert not is_solved(bad, fields.BN254_FR)
