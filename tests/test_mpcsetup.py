"""Powers-of-tau ceremony: contribute/verify chain + PLONK consumption."""

import random

import pytest

from gnark_tpu import fields
from gnark_tpu.backend import mpcsetup, plonk
from gnark_tpu.ec import host
from gnark_tpu.frontend import compile_circuit, witness
from gnark_tpu.frontend.scs import SCSBuilder

from tests.test_frontend import Cubic


def test_phase1_two_contributors():
    s0 = mpcsetup.init_phase1("bn254", 6)
    s1, p1 = mpcsetup.contribute(s0, rng=random.Random(1))
    assert mpcsetup.verify_link(s0, s1, p1)
    s2, p2 = mpcsetup.contribute(s1, rng=random.Random(2))
    assert mpcsetup.verify_link(s1, s2, p2)
    # cheating: swap in a state with an inconsistent power
    bad = mpcsetup.Phase1(curve=s2.curve, n=s2.n,
                          tau1=list(s2.tau1), tau2=list(s2.tau2),
                          alpha_tau1=list(s2.alpha_tau1),
                          beta_tau1=list(s2.beta_tau1), beta2=s2.beta2)
    bad.tau1[3] = host.ec_mul(s2.curve.host_fp, bad.tau1[3], 2)
    assert not mpcsetup.verify_consistency(bad)
    # wrong proof for the link
    assert not mpcsetup.verify_link(s0, s2, p1)


def test_phase1_feeds_plonk():
    cs = compile_circuit(Cubic(), fields.BN254_FR, builder_cls=SCSBuilder)
    s0 = mpcsetup.init_phase1("bn254", 16)
    s1, p1 = mpcsetup.contribute(s0, rng=random.Random(7))
    assert mpcsetup.verify_link(s0, s1, p1)
    srs = mpcsetup.to_kzg_srs(s1)
    pk, vk = plonk.setup(cs, srs)
    pub, sec = witness(Cubic(x=3, y=35), cs)
    proof = plonk.prove(cs, pk, pub, sec, rng=random.Random(3))
    assert plonk.verify(proof, vk, pub)
