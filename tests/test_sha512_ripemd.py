"""SHA-512 and RIPEMD-160 gadgets vs host references."""

import hashlib

from gnark_tpu import fields
from gnark_tpu.frontend import Circuit, Public
from gnark_tpu.std.hash import ripemd160 as rmd
from gnark_tpu.std.hash import sha512 as s5
from gnark_tpu.std.math import uints as u
from gnark_tpu.test_engine import is_solved

F = fields.BN254_FR


def test_ripemd160_host_vectors():
    # official RIPEMD-160 test vectors (Dobbertin et al.)
    vecs = {
        b"": "9c1185a5c5e9fc54612808977ee8f548b2258d31",
        b"a": "0bdc9d2d256b3ee9daae347be6f4dc835a467ffe",
        b"abc": "8eb208f7e05d987a9b044a8e98c6b087f15a0bfc",
        b"message digest": "5d0689ef49d2fae572b881b123a85ffa21595f36",
    }
    for msg, want in vecs.items():
        assert rmd.ripemd160_host(msg).hex() == want


def _check(circuit_cls, inst, ok=True):
    assert is_solved(inst, F) == ok


def test_sha512_circuit():
    msg = b"gnark-tpu sha512 test vector"
    want = hashlib.sha512(msg).digest()
    want_words = [int.from_bytes(want[8 * i:8 * i + 8], "big")
                  for i in range(8)]

    class C(Circuit):
        d0: Public

        def define(self, api):
            blocks = s5.pad_message(msg)
            digest = s5.compress_blocks(api, blocks)
            for w, exp in zip(digest, want_words):
                api.assert_is_equal(u.to_var(api, w), exp)
            api.assert_is_equal(self.d0, want_words[0] % api.field())

    _check(C, C(d0=want_words[0] % F.modulus))
    bad = C(d0=(want_words[0] + 1) % F.modulus)
    _check(C, bad, ok=False)


def test_ripemd160_circuit():
    msg = b"abc"
    want = rmd.ripemd160_host(msg)
    want_words = [int.from_bytes(want[4 * i:4 * i + 4], "little")
                  for i in range(5)]

    class C(Circuit):
        d0: Public

        def define(self, api):
            blocks = rmd.pad_message(msg)
            digest = rmd.compress_blocks(api, blocks)
            for w, exp in zip(digest, want_words):
                api.assert_is_equal(u.to_var(api, w), exp)
            api.assert_is_equal(self.d0, want_words[0])

    _check(C, C(d0=want_words[0]))
    _check(C, C(d0=want_words[0] + 1), ok=False)


def test_u64_u8_roundtrip():
    class C(Circuit):
        x: Public

        def define(self, api):
            w = u.from_var(api, self.x, u.U64)
            api.assert_is_equal(u.to_var(api, w), self.x)
            r = u.rotl(u.rotr(w, 13), 13)
            api.assert_is_equal(u.to_var(api, r), self.x)
            w32 = u.from_var(api, api.sub(self.x, 1), u.U32)
            bs = u.u8s_from_u32(w32)
            back = u.u32_from_u8s(*[bs[i] for i in range(4)])
            api.assert_is_equal(u.to_var(api, back),
                                api.sub(self.x, 1))

    assert is_solved(C(x=0xDEADBEEF), F)
