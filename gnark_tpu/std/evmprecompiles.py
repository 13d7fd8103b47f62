"""EVM precompile gadgets (reference std/evmprecompiles).

Implemented: 0x02 SHA256, 0x04 IDENTITY, 0x06 ECADD (BN254 G1),
0x07 ECMUL (BN254 G1). The BN ops run over the EMULATED bn254 base
field so they compose inside any circuit field (the reference's
file-per-precompile layout maps onto these functions).
Remaining (ECRECOVER 0x01, MODEXP 0x05, pairing 0x08, KZG point
eval 0x0a, BLS 0x0b-0x11, P256VERIFY): follow-ups on the same
emulated machinery.
"""

from __future__ import annotations

import dataclasses

from gnark_tpu.std.algebra import sw_emulated as sw
from gnark_tpu.std.hash import sha256 as sha_gadget
from gnark_tpu.std.math import emulated as emu

BN254_G1 = sw.SWParams(
    name="bn254_g1",
    fp=emu.BN254_FP_EMU,
    fr=emu.EmuParams(
        "bn254_fr",
        21888242871839275222246405745257275088548364400416034343698204186575808495617),
    a=0, b=3, gx=1, gy=2,
)


def sha256(api, blocks_of_vars):
    """0x02: SHA-256 over pre-padded 512-bit blocks of 32-bit words."""
    return sha_gadget.sha256_of_words(api, blocks_of_vars)


def identity(api, values):
    """0x04: datacopy."""
    return list(values)


def ecadd(api, p1, p2):
    """0x06: BN254 G1 add. Points are pairs of emulated Elements
    (distinct, non-infinity — the reference's edge cases route through
    AddUnified; follow-up)."""
    curve = sw.EmulatedCurve(api, BN254_G1)
    curve.assert_on_curve(p1)
    curve.assert_on_curve(p2)
    return curve.add_distinct(p1, p2)


def ecmul(api, p, scalar_bits):
    """0x07: BN254 G1 scalar mul (scalar as LSB-first circuit bits,
    scalar >= 1)."""
    curve = sw.EmulatedCurve(api, BN254_G1)
    curve.assert_on_curve(p)
    return curve.scalar_mul_bits(p, scalar_bits)
