"""ProvingKey / SRS binary persistence (WriteDump/ReadDump +
unsafekzg FS-cache analogs, gnark_tpu/io/keydump.py)."""

import random
import tempfile

from gnark_tpu import fields
from gnark_tpu.backend import groth16, kzg, plonk
from gnark_tpu.frontend import compile_circuit, witness
from gnark_tpu.frontend.scs import SCSBuilder
from gnark_tpu.io import keydump

from tests.test_frontend import Cubic
import pytest

pytestmark = pytest.mark.slow  # heavy e2e: full tier only


def test_groth16_pk_roundtrip_proves():
    cs = compile_circuit(Cubic(), fields.BN254_FR)
    pk, vk = groth16.setup(cs, "bn254", rng=random.Random(1))
    pk2 = keydump.load_groth16_pk(keydump.dump_groth16_pk(pk))
    pub, sec = witness(Cubic(x=3, y=35), cs)
    proof = groth16.prove(cs, pk2, pub, sec, rng=random.Random(2))
    assert groth16.verify(proof, vk, pub)


def test_srs_disk_cache():
    with tempfile.TemporaryDirectory() as d:
        s1 = keydump.srs_cached("bn254", 32, cache_dir=d,
                                rng=random.Random(3))
        s2 = keydump.srs_cached("bn254", 32, cache_dir=d)
        assert s1.g1_host == s2.g1_host
        assert s1.g2_tau == s2.g2_tau


def test_plonk_keys_roundtrip_prove():
    cs = compile_circuit(Cubic(), fields.BN254_FR,
                         builder_cls=SCSBuilder)
    srs = kzg.setup_srs("bn254", 64, rng=random.Random(4))
    pk, vk = plonk.setup(cs, srs)
    pk2 = keydump.load_plonk_pk(keydump.dump_plonk_pk(pk))
    vk2 = keydump.load_plonk_vk(keydump.dump_plonk_vk(vk))
    pub, sec = witness(Cubic(x=3, y=35), cs)
    proof = plonk.prove(cs, pk2, pub, sec, rng=random.Random(5))
    assert plonk.verify(proof, vk2, pub)
