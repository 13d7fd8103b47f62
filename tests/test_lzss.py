"""LZSS codec + in-circuit decompressor (reference std/compress/lzss)."""

import os
import random

import pytest

from gnark_tpu import fields
from gnark_tpu.frontend import Circuit, Public, Secret
from gnark_tpu.std.compress import lzss
from gnark_tpu.test_engine import is_solved

F = fields.BN254_FR
RNG = random.Random(1234)

REF_TESTDATA = "/root/reference/std/compress/lzss/testdata"


def test_host_roundtrip_synthetic():
    cases = [
        b"",
        b"a",
        b"\x00\x00\x00\x00",
        b"abcabcabcabcabcabc",
        b"the quick brown fox jumps over the lazy dog " * 8,
        bytes(RNG.randrange(256) for _ in range(500)),
        bytes([0] * 100 + [7] * 50 + [0] * 30),
    ]
    for data in cases:
        comp = lzss.compress(data)
        assert lzss.decompress(comp) == data, data[:20]
        if len(set(data)) < 30 and len(data) > 50:
            assert len(comp) < len(data)       # actually compresses


@pytest.mark.parametrize("sub", ["705b24", "777003", "c9b5a2"])
def test_host_roundtrip_reference_corpus(sub):
    path = os.path.join(REF_TESTDATA, sub, "data.bin")
    if not os.path.exists(path):
        pytest.skip("reference corpus unavailable")
    data = open(path, "rb").read()[:2000]
    comp = lzss.compress(data)
    assert lzss.decompress(comp) == data


class _Decomp(Circuit):
    c: list[Secret]
    clen: Public
    d: list[Public]
    dlen: Public

    C_MAX = 64
    D_MAX = 96

    def __init__(self, **kw):
        self.c = [None] * self.C_MAX
        self.d = [None] * self.D_MAX
        super().__init__(**kw)

    def define(self, api):
        d, dlen = lzss.decompress_circuit(api, self.c, self.clen,
                                          self.D_MAX)
        for got, want in zip(d, self.d):
            api.assert_is_equal(got, want)
        api.assert_is_equal(dlen, self.dlen)


def test_circuit_decompress():
    data = b"hello hello hello \x00\x00\x00 world world!"
    comp = lzss.compress(data)
    assert lzss.decompress(comp) == data
    assert len(comp) <= _Decomp.C_MAX
    assert len(data) <= _Decomp.D_MAX

    inst = _Decomp(clen=len(comp), dlen=len(data))
    inst.c = list(comp) + [0] * (_Decomp.C_MAX - len(comp))
    inst.d = list(data) + [0] * (_Decomp.D_MAX - len(data))
    assert is_solved(inst, F)

    # tampered output byte
    bad = _Decomp(clen=len(comp), dlen=len(data))
    bad.c = inst.c
    out = list(inst.d)
    out[3] ^= 1
    bad.d = out
    assert not is_solved(bad, F)

    # wrong claimed length
    bad2 = _Decomp(clen=len(comp), dlen=len(data) + 1)
    bad2.c = inst.c
    bad2.d = inst.d
    assert not is_solved(bad2, F)


def test_circuit_decompress_empty():
    inst = _Decomp(clen=0, dlen=0)
    inst.c = [0] * _Decomp.C_MAX
    inst.d = [0] * _Decomp.D_MAX
    assert is_solved(inst, F)
