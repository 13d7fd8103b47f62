"""gnark-bit-exact Fiat-Shamir vectors.

Each challenge is re-derived BY HAND in the test from the reference
semantics (gnark-crypto fiat-shamir.Transcript as used by
backend/plonk/bn254/prove.go:217 + verify.go:88-125):

    digest_i = sha256(challengeID_i || digest_{i-1} || bindings_i)
    value_i  = digest_i mod r        (fr.SetBytes)

and compared against backend/gnark_fs.py. The hash-to-field path rides
the RFC 9380 expand_message_xmd vectors already pinned in
tests/test_std_misc.py.
"""

import hashlib

from gnark_tpu.backend import gnark_fs
from gnark_tpu.ec.curves import CURVES
from gnark_tpu import fields

Q = fields.BN254_FR.modulus
BN254 = CURVES["bn254"]


def test_transcript_hand_vectors():
    ts = gnark_fs.GnarkTranscript(Q, ["gamma", "beta", "alpha"])
    ts.bind("gamma", b"\x01\x02")
    ts.bind("gamma", b"\x03")          # appends
    ts.bind("alpha", b"zz")
    g = ts.challenge("gamma")
    b = ts.challenge("beta")           # no bindings: name + prev only
    a = ts.challenge("alpha")

    d1 = hashlib.sha256(b"gamma" + b"\x01\x02\x03").digest()
    d2 = hashlib.sha256(b"beta" + d1).digest()
    d3 = hashlib.sha256(b"alpha" + d2 + b"zz").digest()
    assert g == int.from_bytes(d1, "big") % Q
    assert b == int.from_bytes(d2, "big") % Q
    assert a == int.from_bytes(d3, "big") % Q


def test_transcript_order_enforced():
    ts = gnark_fs.GnarkTranscript(Q, ["gamma", "beta"])
    try:
        ts.challenge("beta")
    except AssertionError:
        pass
    else:
        raise AssertionError("out-of-order challenge must fail")


def test_g1_raw_bytes():
    # gnark-crypto G1Affine.RawBytes: X||Y big-endian, no flags for a
    # regular bn254 point; infinity = 0b01<<6 then zeros
    P = BN254.g1
    raw = gnark_fs.g1_raw_bytes(BN254, P)
    assert len(raw) == 64
    assert raw == P[0].to_bytes(32, "big") + P[1].to_bytes(32, "big")
    inf = gnark_fs.g1_raw_bytes(BN254, None)
    assert inf[0] == 0b01 << 6 and not any(inf[1:])


def test_g2_raw_bytes_a1_a0_order():
    P = BN254.g2
    raw = gnark_fs.g2_raw_bytes(BN254, P)
    (x0, x1), (y0, y1) = P
    assert raw == (x1.to_bytes(32, "big") + x0.to_bytes(32, "big")
                   + y1.to_bytes(32, "big") + y0.to_bytes(32, "big"))


def test_bls12381_infinity_flag():
    c = CURVES["bls12_381"]
    inf = gnark_fs.g1_raw_bytes(c, None)
    assert len(inf) == 96 and inf[0] == 0x40 and not any(inf[1:])


def test_hash_to_fr_matches_spec():
    # fr.Hash = expand_message_xmd(sha256, msg, dst, 48) mod r
    from gnark_tpu.utils.hash_to_field import expand_message_xmd
    msg, dst = b"test-message", b"BSB22-Plonk"
    want = int.from_bytes(expand_message_xmd(msg, dst, 48), "big") % Q
    assert gnark_fs.hash_to_fr(msg, dst, Q) == want


def test_bsb22_values_and_fold():
    P = BN254.g1
    from gnark_tpu.utils.hash_to_field import expand_message_xmd
    raw = gnark_fs.g1_raw_bytes(BN254, P)
    want = int.from_bytes(
        expand_message_xmd(raw, b"BSB22-Plonk", 48), "big") % Q
    assert gnark_fs.bsb22_plonk_value(BN254, P, Q) == want

    # groth16: SerializeCommitment appends public committed values
    want2 = int.from_bytes(expand_message_xmd(
        raw + (5).to_bytes(32, "big"),
        b"bsb22-commitment", 48), "big") % Q
    assert gnark_fs.bsb22_groth16_value(BN254, P, [5], Q) == want2

    want3 = int.from_bytes(expand_message_xmd(
        (7).to_bytes(32, "big") + (9).to_bytes(32, "big"),
        b"G16-BSB22", 48), "big") % Q
    assert gnark_fs.groth16_fold_challenge([7, 9], Q) == want3


def test_kzg_fold_challenge_hand_vector():
    # deriveGamma: one-challenge transcript binding point.Marshal(),
    # digests (uncompressed), claimed values, extra data
    P = BN254.g1
    zeta, c1, c2 = 11, 22, 33
    extra = (44).to_bytes(32, "big")
    got = gnark_fs.kzg_fold_challenge(
        BN254, Q, zeta, [P], [c1, c2], extra)
    msg = (b"gamma" + zeta.to_bytes(32, "big")
           + gnark_fs.g1_raw_bytes(BN254, P)
           + c1.to_bytes(32, "big") + c2.to_bytes(32, "big") + extra)
    assert got == int.from_bytes(
        hashlib.sha256(msg).digest(), "big") % Q
