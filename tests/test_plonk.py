"""End-to-end PLONK: SCS compile -> setup -> prove -> verify."""

import random

import pytest

from gnark_tpu import fields
from gnark_tpu.backend import kzg, plonk
from gnark_tpu.frontend import Circuit, Public, Secret, compile_circuit, witness
from gnark_tpu.frontend.scs import SCSBuilder

from tests.test_frontend import Cubic


@pytest.fixture(scope="module")
def cubic_plonk():
    cs = compile_circuit(Cubic(), fields.BN254_FR, builder_cls=SCSBuilder)
    srs = kzg.setup_srs("bn254", 64, rng=random.Random(33))
    pk, vk = plonk.setup(cs, srs)
    return cs, pk, vk


def test_plonk_cubic_roundtrip(cubic_plonk):
    cs, pk, vk = cubic_plonk
    pub, sec = witness(Cubic(x=3, y=35), cs)
    proof = plonk.prove(cs, pk, pub, sec, rng=random.Random(1))
    assert plonk.verify(proof, vk, pub)


def test_plonk_wrong_public(cubic_plonk):
    cs, pk, vk = cubic_plonk
    pub, sec = witness(Cubic(x=3, y=35), cs)
    proof = plonk.prove(cs, pk, pub, sec, rng=random.Random(2))
    assert not plonk.verify(proof, vk, [36])


@pytest.mark.slow
def test_plonk_tampered(cubic_plonk):
    cs, pk, vk = cubic_plonk
    pub, sec = witness(Cubic(x=3, y=35), cs)
    p1 = plonk.prove(cs, pk, pub, sec, rng=random.Random(3))
    p2 = plonk.prove(cs, pk, pub, sec, rng=random.Random(4))
    t = plonk.PlonkProof(lro=p1.lro, z=p2.z, h=p1.h, batched_h=p1.batched_h,
                         claimed=p1.claimed, z_shift_h=p1.z_shift_h, zu=p1.zu)
    assert not plonk.verify(t, vk, pub)


class MultiGate(Circuit):
    """Wider circuit: products, booleans, a hint."""
    a: Secret
    b: Secret
    c: Public

    def define(self, api):
        t = api.mul(self.a, self.b)
        u = api.add(t, api.mul(self.a, self.a), 7)
        z = api.is_zero(api.sub(u, self.c))
        api.assert_is_equal(z, 1)


@pytest.mark.slow
def test_plonk_multigate():
    cs = compile_circuit(MultiGate(), fields.BN254_FR,
                         builder_cls=SCSBuilder)
    srs = kzg.setup_srs("bn254", 64, rng=random.Random(44))
    pk, vk = plonk.setup(cs, srs)
    a, b = 5, 11
    c = (a * b + a * a + 7)
    pub, sec = witness(MultiGate(a=a, b=b, c=c), cs)
    proof = plonk.prove(cs, pk, pub, sec, rng=random.Random(5))
    assert plonk.verify(proof, vk, pub)
    assert not plonk.verify(proof, vk, [c + 1])


# ---------------------------------------------------------------------------
# BSB22 commitment circuits (Qcp columns)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_plonk_lookup_commitment():
    """api.commit circuits (log-derivative lookup) prove under PLONK
    (reference backend/plonk/bn254/setup.go:211-218 Qcp columns,
    prove.go:268-311 bsb22Hint)."""
    import dataclasses

    from tests.test_lookup import SBOX, SboxCircuit

    cs = compile_circuit(SboxCircuit(), fields.BN254_FR,
                         builder_cls=SCSBuilder)
    assert len(cs.commitments) == 1
    srs = kzg.setup_srs("bn254", 2 * cs.nb_constraints + 16,
                        rng=random.Random(33))
    pk, vk = plonk.setup(cs, srs)
    assert len(vk.qcp_c) == 1
    pub, sec = witness(SboxCircuit(x=5, y=SBOX[5]), cs)
    proof = plonk.prove(cs, pk, pub, sec, rng=random.Random(1))
    assert len(proof.bsb22) == 1 and len(proof.claimed) == 7
    assert plonk.verify(proof, vk, pub)
    assert not plonk.verify(proof, vk, [SBOX[4]])
    # tampering with the pi2 commitment must break the challenge chain
    t = dataclasses.replace(proof, bsb22=[proof.lro[0]])
    assert not plonk.verify(t, vk, pub)


@pytest.mark.slow
def test_plonk_rangecheck_commitment():
    """Commit-based log-derivative range check under PLONK."""
    from gnark_tpu.std.rangecheck import check_many_logderiv

    class RC(Circuit):
        x: Secret

        def define(self, api):
            # 2^12-entry table (a 2^16 one costs 393k constraints /
            # N=2^19 — same code path, 16x the test time)
            check_many_logderiv(api, [self.x], 12)

    cs = compile_circuit(RC(), fields.BN254_FR, builder_cls=SCSBuilder)
    assert cs.commitments, "commit-mode rangecheck must use api.commit"
    srs = kzg.setup_srs("bn254", 2 * cs.nb_constraints + 16,
                        rng=random.Random(7))
    pk, vk = plonk.setup(cs, srs)
    pub, sec = witness(RC(x=4095), cs)
    proof = plonk.prove(cs, pk, pub, sec, rng=random.Random(2))
    assert plonk.verify(proof, vk, pub)


@pytest.mark.slow
def test_plonk_multi_commitments():
    """Two independent api.commit calls -> two Qcp columns."""
    class TwoCommits(Circuit):
        a: Secret
        b: Secret
        s: Public

        def define(self, api):
            c1 = api.commit(self.a)
            c2 = api.commit(self.b, c1)
            api.assert_is_different(c1, 0)
            api.assert_is_different(c2, 0)
            api.assert_is_equal(api.add(self.a, self.b), self.s)

    cs = compile_circuit(TwoCommits(), fields.BN254_FR,
                         builder_cls=SCSBuilder)
    assert len(cs.commitments) == 2
    srs = kzg.setup_srs("bn254", 2 * cs.nb_constraints + 16,
                        rng=random.Random(9))
    pk, vk = plonk.setup(cs, srs)
    pub, sec = witness(TwoCommits(a=3, b=4, s=7), cs)
    proof = plonk.prove(cs, pk, pub, sec, rng=random.Random(3))
    assert len(proof.bsb22) == 2 and len(proof.claimed) == 8
    assert plonk.verify(proof, vk, pub)
    assert not plonk.verify(proof, vk, [8])


@pytest.mark.slow
def test_plonk_rho_pass_matches(monkeypatch):
    """rho-pass quotient (memory mode) == one-shot 4N proof,
    bit-identical with the same rng (reference prove.go:936-1020)."""
    import random as _r
    monkeypatch.setenv("GNARK_TPU_PLONK_RHO_LOG", "1")
    cs = compile_circuit(Cubic(), fields.BN254_FR, builder_cls=SCSBuilder)
    srs = kzg.setup_srs("bn254", 64, rng=_r.Random(3))
    pk, vk = plonk.setup(cs, srs)
    pub, sec = witness(Cubic(x=3, y=35), cs)
    p_rho = plonk.prove(cs, pk, pub, sec, rng=_r.Random(4))
    monkeypatch.setenv("GNARK_TPU_PLONK_RHO_LOG", "30")
    p_one = plonk.prove(cs, pk, pub, sec, rng=_r.Random(4))
    assert p_rho.lro == p_one.lro
    assert p_rho.h == p_one.h
    assert p_rho.claimed == p_one.claimed
    assert plonk.verify(p_rho, vk, pub)


@pytest.mark.slow
def test_plonk_statistical_zk():
    """StatisticalZK quotient randomizers: proofs still verify, shard
    commitments are re-randomized (reference prove.go:238-242)."""
    import random as _r
    cs = compile_circuit(Cubic(), fields.BN254_FR, builder_cls=SCSBuilder)
    srs = kzg.setup_srs("bn254", 64, rng=_r.Random(3))
    pk, vk = plonk.setup(cs, srs)
    pub, sec = witness(Cubic(x=3, y=35), cs)
    p1 = plonk.prove(cs, pk, pub, sec, rng=_r.Random(4))
    p2 = plonk.prove(cs, pk, pub, sec, rng=_r.Random(4),
                     statistical_zk=True)
    assert plonk.verify(p2, vk, pub)
    assert p1.h != p2.h          # shards re-randomized
