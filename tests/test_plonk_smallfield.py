"""Small-field PLONK setup over koalabear (reference
backend/plonk/koalabear/setup.go — setup-only, like the reference)."""

import random

from gnark_tpu import fields
from gnark_tpu.backend import plonk_smallfield as psf
from gnark_tpu.constraint import solve
from gnark_tpu.frontend import Circuit, Public, Secret, compile_circuit, \
    witness
from gnark_tpu.frontend.scs import SCSBuilder


class Cubic(Circuit):
    x: Secret
    y: Public

    def define(self, api):
        x3 = api.mul(self.x, self.x, self.x)
        api.assert_is_equal(api.add(x3, self.x, 5), self.y)


def test_smallfield_trace_koalabear():
    F = fields.KOALABEAR
    q = F.modulus
    cs = compile_circuit(Cubic(), F, builder_cls=SCSBuilder)
    tr = psf.setup(cs, F)
    N = tr.size

    # sigma is a permutation of the 3N slots
    assert sorted(tr.perm) == list(range(3 * N))
    # the copy-constraint grand product telescopes to 1 on a valid
    # witness (the identity the Z polynomial enforces)
    x = 3
    y = (pow(x, 3, q) + x + 5) % q
    pub, sec = witness(Cubic(x=x, y=y), cs)
    sol = solve(cs, pub, sec)
    vals = sol.values

    lro_vars = [0] * (3 * N)
    for i in range(tr.nb_public):
        lro_vars[i] = i
    off = tr.nb_public
    for j, con in enumerate(cs.sparse):
        lro_vars[off + j] = con.xa
        lro_vars[N + off + j] = con.xb
        lro_vars[2 * N + off + j] = con.xo

    def slot_val(s):
        v = lro_vars[s]
        return vals[v] % q if 0 <= v < len(vals) else 0

    rng = random.Random(5)
    beta, gamma = rng.randrange(1, q), rng.randrange(1, q)
    wpow = [1] * N
    for i in range(1, N):
        wpow[i] = wpow[i - 1] * tr.generator % q

    def idpoint(s):
        return pow(tr.coset_shift, s // N, q) * wpow[s % N] % q

    num = den = 1
    sig = {0: tr.s1, 1: tr.s2, 2: tr.s3}
    for s in range(3 * N):
        v = slot_val(s)
        num = num * ((v + beta * idpoint(s) + gamma) % q) % q
        den = den * ((v + beta * sig[s // N][s % N] + gamma) % q) % q
    assert num == den, "copy-constraint product must telescope"

    # gate identity holds row-wise
    for j, con in enumerate(cs.sparse):
        r = off + j
        l_v, r_v, o_v = (vals[con.xa] % q, vals[con.xb] % q,
                         vals[con.xo] % q)
        g = (tr.ql[r] * l_v + tr.qr[r] * r_v + tr.qm[r] * l_v * r_v
             + tr.qo[r] * o_v + tr.qk[r]) % q
        assert g == 0, j


def test_smallfield_trace_babybear():
    F = fields.BABYBEAR
    cs = compile_circuit(Cubic(), F, builder_cls=SCSBuilder)
    tr = psf.setup(cs, F)
    assert sorted(tr.perm) == list(range(3 * tr.size))
