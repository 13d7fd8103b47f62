"""E4 extension over small fields (reference std/internal/fieldextension)."""

import random

from gnark_tpu import fields
from gnark_tpu.frontend import Circuit, Public
from gnark_tpu.std.internal.fieldextension import ExtensionField, EXT_PARAMS
from gnark_tpu.test_engine import is_solved

RNG = random.Random(77)


def host_mul(p, nr, d, a, b):
    t = [0] * (2 * d - 1)
    for i in range(d):
        for j in range(d):
            t[i + j] = (t[i + j] + a[i] * b[j]) % p
    for i in range(2 * d - 2, d - 1, -1):
        t[i - d] = (t[i - d] + t[i] * nr) % p
    return t[:d]


def test_e4_mul_inv_koalabear():
    name = "koalabear"
    F = fields.FIELDS[name]
    p = F.modulus
    prm = EXT_PARAMS[name]
    d, nr = prm["degree"], prm["nr"]
    a = [RNG.randrange(p) for _ in range(d)]
    b = [RNG.randrange(p) for _ in range(d)]
    want = host_mul(p, nr, d, a, b)

    class C(Circuit):
        ok: Public

        def define(self, api):
            ext = ExtensionField(api, name)
            ea, eb = ext.from_coeffs(a), ext.from_coeffs(b)
            ext.assert_eq(ext.mul(ea, eb), ext.from_coeffs(want))
            # inverse roundtrip: a * a^-1 == 1
            inv = ext.inv(ea)
            ext.assert_eq(ext.mul(ea, inv), ext.one)
            api.assert_is_equal(self.ok, 1)

    assert is_solved(C(ok=1), F)
    # wrong product rejected
    bad = list(want)
    bad[0] = (bad[0] + 1) % p

    class CBad(Circuit):
        ok: Public

        def define(self, api):
            ext = ExtensionField(api, name)
            ext.assert_eq(ext.mul(ext.from_coeffs(a), ext.from_coeffs(b)),
                          ext.from_coeffs(bad))

    assert not is_solved(CBad(ok=1), F)


def test_e4_babybear_smoke():
    name = "babybear"
    F = fields.FIELDS[name]
    p = F.modulus
    a = [RNG.randrange(p) for _ in range(4)]

    class C(Circuit):
        ok: Public

        def define(self, api):
            ext = ExtensionField(api, name)
            ea = ext.from_coeffs(a)
            ext.assert_eq(ext.mul(ea, ext.inv(ea)), ext.one)

    assert is_solved(C(ok=1), F)
