"""Powers-of-tau ceremony: contribute/verify chain + PLONK consumption."""

import random

import pytest

from gnark_tpu import fields
from gnark_tpu.backend import mpcsetup, plonk
from gnark_tpu.ec import host
from gnark_tpu.frontend import compile_circuit, witness
from gnark_tpu.frontend.scs import SCSBuilder

from tests.test_frontend import Cubic

pytestmark = pytest.mark.slow  # heavy e2e: full tier only


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


# ---------------------------------------------------------------------------
# Phase 2 (circuit specialization) + transcript-bound PoKs
# ---------------------------------------------------------------------------

def test_phase2_ceremony_to_keys():
    """Phase1 -> Phase2 -> (pk, vk) that prove and verify
    (reference phase2.go + lagrange.go + key extraction)."""
    import random

    from gnark_tpu import fields
    from gnark_tpu.backend import groth16
    from gnark_tpu.frontend import compile_circuit, witness
    from tests.test_frontend import Cubic

    cs = compile_circuit(Cubic(), fields.BN254_FR)
    s0 = mpcsetup.init_phase1("bn254", 8)
    s1, c1 = mpcsetup.contribute(s0, rng=random.Random(1))
    assert mpcsetup.verify_link(s0, s1, c1)
    p0 = mpcsetup.init_phase2(cs, s1)
    p1, k1 = mpcsetup.contribute_phase2(p0, rng=random.Random(3))
    assert mpcsetup.verify_phase2_link(p0, p1, k1)
    p2, k2 = mpcsetup.contribute_phase2(p1, rng=random.Random(4))
    assert mpcsetup.verify_phase2_link(p1, p2, k2)
    pk, vk = mpcsetup.extract_keys(cs, s1, p2)
    pub, sec = witness(Cubic(x=3, y=35), cs)
    proof = groth16.prove(cs, pk, pub, sec, rng=random.Random(5))
    assert groth16.verify(proof, vk, pub)
    assert not groth16.verify(proof, vk, [36])


@pytest.mark.slow
def test_phase2_tampered_contribution_rejected():
    import dataclasses
    import random

    from gnark_tpu import fields
    from gnark_tpu.frontend import compile_circuit
    from gnark_tpu.ec import host
    from tests.test_frontend import Cubic

    cs = compile_circuit(Cubic(), fields.BN254_FR)
    s0 = mpcsetup.init_phase1("bn254", 8)
    s1, _ = mpcsetup.contribute(s0, rng=random.Random(1))
    p0 = mpcsetup.init_phase2(cs, s1)
    p1, k1 = mpcsetup.contribute_phase2(p0, rng=random.Random(3))
    # tamper: swap delta for an unrelated point (z/pkk now inconsistent)
    f1 = p1.curve.host_fp
    bad = dataclasses.replace(
        p1, delta1=host.ec_mul(f1, p1.curve.g1, 12345))
    assert not mpcsetup.verify_phase2_link(p0, bad, k1)


@pytest.mark.slow
def test_phase1_pok_replay_rejected():
    """A contribution replayed onto a different chain state must fail
    (the PoK base binds the previous-state transcript)."""
    import random

    s0 = mpcsetup.init_phase1("bn254", 4)
    s1, c1 = mpcsetup.contribute(s0, rng=random.Random(7))
    assert mpcsetup.verify_link(s0, s1, c1)
    # replay c1's proof against a DIFFERENT previous state
    s1b, _ = mpcsetup.contribute(s0, rng=random.Random(8))
    s2, c2 = mpcsetup.contribute(s1b, rng=random.Random(7))
    # c2 was bound to s1b; trying to pass it off as a link from s1:
    assert not mpcsetup.verify_link(s1, s2, c2)


# ---------------------------------------------------------------------------
# Seal / beacon finalization (reference phase1.go:153-181 + setup.go)
# ---------------------------------------------------------------------------

def test_sealed_ceremony_to_keys():
    """contribute x2 -> seal(beacon) on both phases -> extracted keys
    prove+verify; tampered beacon rejected."""
    import random

    from gnark_tpu import fields
    from gnark_tpu.backend import groth16
    from gnark_tpu.frontend import compile_circuit, witness
    from tests.test_frontend import Cubic

    beacon = b"drand round 4242"
    cs = compile_circuit(Cubic(), fields.BN254_FR)
    s0 = mpcsetup.init_phase1("bn254", 8)
    s1, c1 = mpcsetup.contribute(s0, rng=random.Random(11))
    assert mpcsetup.verify_link(s0, s1, c1)
    s2, c2 = mpcsetup.contribute(s1, rng=random.Random(12))
    assert mpcsetup.verify_link(s1, s2, c2)
    s3 = mpcsetup.seal_phase1(s2, beacon)
    assert mpcsetup.verify_seal_phase1(s2, s3, beacon)
    assert not mpcsetup.verify_seal_phase1(s2, s3, b"other beacon")
    assert mpcsetup.verify_consistency(s3)

    p0 = mpcsetup.init_phase2(cs, s3)
    p1, k1 = mpcsetup.contribute_phase2(p0, rng=random.Random(13))
    assert mpcsetup.verify_phase2_link(p0, p1, k1)
    p2 = mpcsetup.seal_phase2(p1, beacon)
    assert mpcsetup.verify_seal_phase2(p1, p2, beacon)
    assert not mpcsetup.verify_seal_phase2(p1, p2, b"x")

    pk, vk = mpcsetup.extract_keys(cs, s3, p2)
    pub, sec = witness(Cubic(x=3, y=35), cs)
    proof = groth16.prove(cs, pk, pub, sec, rng=random.Random(14))
    assert groth16.verify(proof, vk, pub)
    assert not groth16.verify(proof, vk, [36])
