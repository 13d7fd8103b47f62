"""In-circuit fiat-shamir, conversions, multicommit tests."""

from gnark_tpu import fields
from gnark_tpu.constraint import solve
from gnark_tpu.frontend import Circuit, Public, Secret, compile_circuit, witness
from gnark_tpu.std import conversion, multicommit
from gnark_tpu.std.fiatshamir import Transcript
from gnark_tpu.std.hash.mimc import MiMC
from gnark_tpu.test_engine import TestEngine, is_solved

F = fields.BN254_FR


def test_fiatshamir_matches_host_mimc():
    """Engine-evaluated transcript must equal the host MiMC recipe."""
    api = TestEngine(F)
    ts = Transcript(api, ["alpha", "beta"])
    ts.bind("alpha", 11, 22)
    a = ts.compute_challenge("alpha")
    ts.bind("beta", 33)
    b = ts.compute_challenge("beta")

    h = MiMC().write(int.from_bytes(b"alpha", "big"), 11, 22)
    assert a == h.sum()
    h2 = MiMC().write(int.from_bytes(b"beta", "big"), a, 33)
    assert b == h2.sum()


class BytesCircuit(Circuit):
    x: Secret
    b0: Public

    def define(self, api):
        bts = conversion.to_bytes(api, self.x, 4)
        api.assert_is_equal(bts[0], self.b0)      # most significant byte
        api.assert_is_equal(conversion.from_bytes(api, bts), self.x)


def test_conversion_bytes():
    x = 0xDEADBEEF
    assert is_solved(BytesCircuit(x=x, b0=0xDE), F)
    assert not is_solved(BytesCircuit(x=x, b0=0xAD), F)
    cs = compile_circuit(BytesCircuit(), F)
    pub, sec = witness(BytesCircuit(x=x, b0=0xDE), cs)
    solve(cs, pub, sec)


class MultiCommitCircuit(Circuit):
    x: Secret

    def define(self, api):
        got = []

        def cb1(api_, ch):
            got.append(ch)
            api_.assert_is_different(ch, 0)

        def cb2(api_, ch):
            got.append(ch)
            api_.assert_is_different(ch, 0)

        multicommit.with_commitment(api, cb1, self.x)
        multicommit.with_commitment(api, cb2, api.mul(self.x, self.x))


def test_multicommit():
    assert is_solved(MultiCommitCircuit(x=5), F)
    cs = compile_circuit(MultiCommitCircuit(), F)
    assert len(cs.commitments) == 1   # one commitment, many challenges
    pub, sec = witness(MultiCommitCircuit(x=5), cs)
    solve(cs, pub, sec)


def test_polynomial_gadgets():
    import random
    from gnark_tpu import fields
    from gnark_tpu.frontend import Circuit, Public
    from gnark_tpu.std.math import polynomial as poly
    from gnark_tpu.test_engine import is_solved
    F = fields.BN254_FR
    q = F.modulus
    rng = random.Random(3)
    coeffs = [rng.randrange(q) for _ in range(5)]
    x = rng.randrange(q)
    want_uni = 0
    for c in reversed(coeffs):
        want_uni = (want_uni * x + c) % q
    vals = [rng.randrange(q) for _ in range(8)]
    pt = [rng.randrange(q) for _ in range(3)]
    t = list(vals)
    for r in pt:
        half = len(t) // 2
        t = [(t[i] + r * (t[half + i] - t[i])) % q for i in range(half)]
    want_mle = t[0]
    evs = [rng.randrange(q) for _ in range(4)]
    xx = rng.randrange(q)
    want_interp = 0
    for i, v in enumerate(evs):
        num = den = 1
        for j in range(4):
            if j != i:
                num = num * (xx - j) % q
                den = den * (i - j) % q
        want_interp = (want_interp + v * num * pow(den, -1, q)) % q

    class C(Circuit):
        ok: Public

        def define(self, api):
            api.assert_is_equal(
                poly.eval_univariate(api, coeffs, x), want_uni)
            api.assert_is_equal(
                poly.eval_multilinear(api, vals, pt), want_mle)
            api.assert_is_equal(
                poly.interpolate_on_range(api, evs, xx), want_interp)

    assert is_solved(C(ok=1), F)


def test_hash_to_field_rfc9380():
    from gnark_tpu.utils.hash_to_field import (expand_message_xmd,
                                               hash_to_field)
    # RFC 9380 K.1 (expand_message_xmd, SHA-256) first vector
    got = expand_message_xmd(
        b"", b"QUUX-V01-CS02-with-expander-SHA256-128", 0x20)
    assert got.hex() == ("68a985b87eb6b46952128911f2a4412b"
                         "bc302a9d759667f87f7a21d803f07235")
    # structural: determinism, domain separation, reduction
    p = 21888242871839275222246405745257275088548364400416034343698204186575808495617
    a = hash_to_field(b"msg", b"dst1", 2, p)
    b = hash_to_field(b"msg", b"dst2", 2, p)
    assert a == hash_to_field(b"msg", b"dst1", 2, p)
    assert a != b
    assert all(0 <= v < p for v in a + b)
    # 48-byte reduction really spreads beyond 2^254
    big = hash_to_field(b"x", b"d", 64, p)
    assert len(set(big)) == 64


def test_batch_invert():
    import random
    from gnark_tpu import fields
    from gnark_tpu.frontend import Circuit, Public, Secret
    from gnark_tpu.std.selector import batch_invert
    from gnark_tpu.test_engine import is_solved
    F = fields.BN254_FR
    q = F.modulus
    rng = random.Random(8)
    vals = [rng.randrange(1, q) for _ in range(5)]
    invs = [pow(v, -1, q) for v in vals]

    class C(Circuit):
        ok: Public

        def define(self, api):
            outs = batch_invert(api, vals)
            for got, want in zip(outs, invs):
                api.assert_is_equal(got, want)

    assert is_solved(C(ok=1), F)

    class CZero(Circuit):
        ok: Public

        def define(self, api):
            batch_invert(api, [3, 0, 5])

    assert not is_solved(CZero(ok=1), F)
