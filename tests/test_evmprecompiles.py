"""EVM precompile gadgets vs the host BN254 oracle."""

import random

from gnark_tpu import fields
from gnark_tpu.ec import curves, host
from gnark_tpu.frontend import Circuit, Public, Secret, compile_circuit, witness
from gnark_tpu.std import evmprecompiles as evm
from gnark_tpu.std.math import emulated as emu
from gnark_tpu.test_engine import is_solved

F = fields.BN254_FR
RNG = random.Random(2718)
BN = curves.CURVES["bn254"]


def limbs(v):
    return [(v >> (emu.B * i)) & emu.MASK for i in range(emu.K)]


class EcAdd(Circuit):
    ax: list[Secret]
    ay: list[Secret]
    bx: list[Secret]
    by: list[Secret]
    rx: list[Public]

    def __init__(self, **kw):
        for n in ("ax", "ay", "bx", "by", "rx"):
            setattr(self, n, [None] * emu.K)
        super().__init__(**kw)

    def define(self, api):
        f = emu.EmulatedField(api, emu.BN254_FP_EMU)
        p1 = (f.from_limb_vars(self.ax), f.from_limb_vars(self.ay))
        p2 = (f.from_limb_vars(self.bx), f.from_limb_vars(self.by))
        r = evm.ecadd(api, p1, p2)
        f.assert_is_equal(r[0], f.from_limb_vars(self.rx))


def test_ecadd_precompile():
    fh = BN.host_fp
    P = host.ec_mul(fh, BN.g1, RNG.randrange(1, 10 ** 30))
    Q = host.ec_mul(fh, BN.g1, RNG.randrange(1, 10 ** 30))
    R = host.ec_add(fh, P, Q)
    c = EcAdd()
    c.ax, c.ay = limbs(P[0]), limbs(P[1])
    c.bx, c.by = limbs(Q[0]), limbs(Q[1])
    c.rx = limbs(R[0])
    assert is_solved(c, F)
    bad = EcAdd()
    bad.ax, bad.ay, bad.bx, bad.by = c.ax, c.ay, c.bx, c.by
    bad.rx = limbs((R[0] + 1) % BN.fp.modulus)
    assert not is_solved(bad, F)
    # off-curve input rejected
    off = EcAdd()
    off.ax, off.ay = limbs(P[0]), limbs((P[1] + 1) % BN.fp.modulus)
    off.bx, off.by, off.rx = c.bx, c.by, c.rx
    assert not is_solved(off, F)


class EcMul(Circuit):
    px: list[Secret]
    py: list[Secret]
    k: Secret
    rx: list[Public]

    def __init__(self, **kw):
        for n in ("px", "py", "rx"):
            setattr(self, n, [None] * emu.K)
        super().__init__(**kw)

    def define(self, api):
        f = emu.EmulatedField(api, emu.BN254_FP_EMU)
        p = (f.from_limb_vars(self.px), f.from_limb_vars(self.py))
        bits = api.to_binary(self.k, 16)
        r = evm.ecmul(api, p, bits)
        f.assert_is_equal(r[0], f.from_limb_vars(self.rx))


def test_ecmul_precompile():
    fh = BN.host_fp
    P = host.ec_mul(fh, BN.g1, RNG.randrange(1, 10 ** 30))
    k = RNG.randrange(1, 1 << 16)
    R = host.ec_mul(fh, P, k)
    c = EcMul(k=k)
    c.px, c.py = limbs(P[0]), limbs(P[1])
    c.rx = limbs(R[0])
    assert is_solved(c, F)
    bad = EcMul(k=k + 1)
    bad.px, bad.py, bad.rx = c.px, c.py, c.rx
    assert not is_solved(bad, F)
