"""gnark binary-format interop gate.

Parses gnark-generated VerifyingKey binaries (checked-in fixtures from
the reference's backend/solidity/testdata) and cross-checks the
decompressed points against the constants gnark itself embedded in the
matching exported Solidity verifiers — a bit-exact test of our point
(de)compression, field widths and layout bookkeeping that fails if any
convention drifts from gnark's."""

import os
import re

import pytest

from gnark_tpu.ec.curves import CURVES
from gnark_tpu.ec.host import INF, ec_neg
from gnark_tpu.io import gnark as gio

DATA = os.path.join(os.path.dirname(__file__), "data", "gnark_fixtures")


def _load(name):
    with open(os.path.join(DATA, name), "rb") as f:
        return f.read()


def _sol_constants(name):
    txt = open(os.path.join(DATA, name)).read()
    out = {}
    for m in re.finditer(
            r"uint256 constant (\w+) = (0x[0-9a-fA-F]+|\d+);", txt):
        out[m.group(1)] = int(m.group(2), 0)
    return out


def test_groth16_vk_bn254_nocommit():
    vk = gio.read_groth16_vk(
        "bn254", _load("blank_groth16_bn254_nocommit.vk"))
    sol = _sol_constants("blank_groth16_bn254_nocommit.sol")
    p = CURVES["bn254"].fp.modulus
    assert vk.g1_alpha == (sol["ALPHA_X"], sol["ALPHA_Y"])
    # the contract stores the NEGATED G2 points
    f2 = CURVES["bn254"].host_g2_field
    neg_beta = (vk.g2_beta[0], f2.neg(vk.g2_beta[1]))
    assert neg_beta == ((sol["BETA_NEG_X_0"], sol["BETA_NEG_X_1"]),
                        (sol["BETA_NEG_Y_0"], sol["BETA_NEG_Y_1"]))
    neg_gamma = (vk.g2_gamma[0], f2.neg(vk.g2_gamma[1]))
    assert neg_gamma == ((sol["GAMMA_NEG_X_0"], sol["GAMMA_NEG_X_1"]),
                         (sol["GAMMA_NEG_Y_0"], sol["GAMMA_NEG_Y_1"]))
    neg_delta = (vk.g2_delta[0], f2.neg(vk.g2_delta[1]))
    assert neg_delta == ((sol["DELTA_NEG_X_0"], sol["DELTA_NEG_X_1"]),
                         (sol["DELTA_NEG_Y_0"], sol["DELTA_NEG_Y_1"]))
    # K points appear as CONSTANT_X/Y, PUB_i_X/Y
    assert vk.g1_k[0] == (sol["CONSTANT_X"], sol["CONSTANT_Y"])
    for i, P in enumerate(vk.g1_k[1:]):
        assert P == (sol[f"PUB_{i}_X"], sol[f"PUB_{i}_Y"]), i
    assert not vk.commitment_keys


def test_groth16_vk_bn254_commit():
    vk = gio.read_groth16_vk(
        "bn254", _load("blank_groth16_bn254_commit.vk"))
    assert len(vk.commitment_keys) == 1
    assert vk.public_and_commitment_committed is not None


def test_groth16_vk_bls12381():
    vk = gio.read_groth16_vk(
        "bls12_381", _load("blank_groth16_bls12381_nocommit.vk"))
    assert len(vk.g1_k) >= 1


def test_plonk_vk_bn254():
    vk = gio.read_plonk_vk(
        "bn254", _load("blank_plonk_bn254_nocommit.vk"))
    sol = _sol_constants("blank_plonk_bn254_nocommit.sol")
    q = CURVES["bn254"].fr.modulus
    assert vk.size == sol.get("VK_DOMAIN_SIZE", vk.size)
    if "VK_OMEGA" in sol:
        assert vk.generator == sol["VK_OMEGA"]
    if "VK_QL_COM_X" in sol:
        assert vk.ql == (sol["VK_QL_COM_X"], sol["VK_QL_COM_Y"])
        assert vk.qr == (sol["VK_QR_COM_X"], sol["VK_QR_COM_Y"])
        assert vk.qm == (sol["VK_QM_COM_X"], sol["VK_QM_COM_Y"])
        assert vk.qo == (sol["VK_QO_COM_X"], sol["VK_QO_COM_Y"])
        assert vk.qk == (sol["VK_QK_COM_X"], sol["VK_QK_COM_Y"])
    assert pow(vk.generator, vk.size, q) == 1
    assert not vk.commitment_indexes


def test_plonk_vk_bn254_commit():
    vk = gio.read_plonk_vk(
        "bn254", _load("blank_plonk_bn254_commit.vk"))
    assert len(vk.qcp) == 1
    assert len(vk.commitment_indexes) == 1


def test_plonk_vk_bls12381():
    vk = gio.read_plonk_vk(
        "bls12_381", _load("blank_plonk_bls12381_nocommit.vk"))
    q = CURVES["bls12_381"].fr.modulus
    assert pow(vk.generator, vk.size, q) == 1


def test_groth16_vk_roundtrip_ours():
    """Our Groth16 vk serialized in gnark's layout re-reads bit-exact."""
    import random
    from gnark_tpu import fields
    from gnark_tpu.backend import groth16
    from gnark_tpu.frontend import Circuit, Public, Secret, \
        compile_circuit

    class Cubic(Circuit):
        x: Secret
        y: Public

        def define(self, api):
            x3 = api.mul(self.x, self.x, self.x)
            api.assert_is_equal(api.add(x3, self.x, 5), self.y)

    cs = compile_circuit(Cubic(), fields.BN254_FR)
    _, vk = groth16.setup(cs, "bn254", rng=random.Random(9))
    blob = gio.write_groth16_vk(vk)
    back = gio.read_groth16_vk("bn254", blob)
    assert back.g1_alpha == tuple(vk.g1_alpha)
    assert back.g2_beta == tuple(vk.g2_beta)
    assert back.g2_gamma == tuple(vk.g2_gamma)
    assert back.g2_delta == tuple(vk.g2_delta)
    assert [tuple(P) for P in back.g1_k] == [tuple(P) for P in vk.g1_k]


def test_groth16_proof_roundtrip_gnark_format():
    import random
    from gnark_tpu import fields
    from gnark_tpu.backend import groth16
    from gnark_tpu.frontend import Circuit, Public, Secret, \
        compile_circuit, witness

    class Cubic(Circuit):
        x: Secret
        y: Public

        def define(self, api):
            x3 = api.mul(self.x, self.x, self.x)
            api.assert_is_equal(api.add(x3, self.x, 5), self.y)

    cs = compile_circuit(Cubic(), fields.BN254_FR)
    pk, vk = groth16.setup(cs, "bn254", rng=random.Random(13))
    pub, sec = witness(Cubic(x=3, y=35), cs)
    proof = groth16.prove(cs, pk, pub, sec, rng=random.Random(14))
    blob = gio.write_groth16_proof(proof, "bn254")
    back = gio.read_groth16_proof("bn254", blob)
    assert back.ar == tuple(proof.ar)
    assert back.bs == tuple(proof.bs)
    assert back.krs == tuple(proof.krs)
    assert groth16.verify(back, vk, pub)
    # corrupt a byte -> decompression or verification fails
    bad = bytearray(blob)
    bad[3] ^= 1
    import pytest as _p
    try:
        p2 = gio.read_groth16_proof("bn254", bytes(bad))
        assert not groth16.verify(p2, vk, pub)
    except ValueError:
        pass


def test_plonk_proof_roundtrip_gnark_format():
    import random
    from gnark_tpu import fields
    from gnark_tpu.backend import kzg, plonk
    from gnark_tpu.frontend import Circuit, Public, Secret, \
        compile_circuit, witness
    from gnark_tpu.frontend.scs import SCSBuilder

    class Cubic(Circuit):
        x: Secret
        y: Public

        def define(self, api):
            x3 = api.mul(self.x, self.x, self.x)
            api.assert_is_equal(api.add(x3, self.x, 5), self.y)

    cs = compile_circuit(Cubic(), fields.BN254_FR,
                         builder_cls=SCSBuilder)
    srs = kzg.setup_srs("bn254", 64, rng=random.Random(15))
    pk, vk = plonk.setup(cs, srs)
    pub, sec = witness(Cubic(x=3, y=35), cs)
    proof = plonk.prove(cs, pk, pub, sec, rng=random.Random(16))
    blob = gio.write_plonk_proof(proof, "bn254")
    back = gio.read_plonk_proof("bn254", blob)
    assert back.claimed == proof.claimed
    assert back.zu == proof.zu
    assert plonk.verify(back, vk, pub)
