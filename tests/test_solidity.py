"""Solidity export: structural checks + EVM-semantics simulation.

No solc in the image (the reference gates compilation behind
-tags=solccheck similarly); we simulate the contract's pairing-product
equation host-side instead: e(-A,B)*e(alpha,beta)*e(vkx,gamma)*
e(C,delta) == 1 with the exact points the contract would use.
"""

import random

import pytest

from gnark_tpu import fields
from gnark_tpu.backend import groth16, solidity
from gnark_tpu.ec import curves, host
from gnark_tpu.frontend import compile_circuit, witness
from gnark_tpu.pairing import get_pairing

from tests.test_frontend import Cubic

pytestmark = pytest.mark.slow  # heavy e2e: full tier only


@pytest.fixture(scope="module")
def setup_proof():
    cs = compile_circuit(Cubic(), fields.BN254_FR)
    rng = random.Random(77)
    pk, vk = groth16.setup(cs, "bn254", rng=rng)
    pub, sec = witness(Cubic(x=3, y=35), cs)
    proof = groth16.prove(cs, pk, pub, sec, rng=rng)
    return vk, proof, pub


def test_export_structure(setup_proof):
    vk, proof, pub = setup_proof
    src = solidity.export_groth16_verifier(vk)
    assert "function verifyProof" in src
    assert f"ALPHA_X = {vk.g1_alpha[0]}" in src
    # EIP-197: imaginary part first
    assert f"BETA_X1 = {vk.g2_beta[0][1]}" in src
    assert "staticcall(gas(), 8" in src
    assert "pragma solidity" in src
    cd = solidity.proof_calldata(proof)
    assert len(cd) == 8 and cd[0] == proof.ar[0]


def test_contract_equation_semantics(setup_proof):
    """The pairing equation the contract checks must hold for a valid
    proof and fail for a wrong public input."""
    vk, proof, pub = setup_proof
    curve = curves.CURVES["bn254"]
    f1 = curve.host_fp
    pairing = get_pairing("bn254")

    def contract_checks(public):
        vkx = vk.g1_k[0]
        for v, pt in zip(public, vk.g1_k[1:]):
            vkx = host.ec_add(f1, vkx, host.ec_mul(f1, pt, v))
        neg_a = host.ec_neg(f1, proof.ar)
        res = pairing.pairing_product([
            (neg_a, proof.bs),
            (vk.g1_alpha, vk.g2_beta),
            (vkx, vk.g2_gamma),
            (proof.krs, vk.g2_delta),
        ])
        return pairing.ext.eq(res, pairing.gt_one())

    assert contract_checks(pub)
    assert not contract_checks([36])


def test_plonk_export_and_simulate():
    """Emit the PLONK verifier contract and EXECUTE its embedded
    constants + documented equations in a python simulator against a
    real proof (accept) and tampered inputs (reject) — solc is not in
    the image, so the simulator is the semantic check; it derives
    everything from the .sol text, not from the vk object."""
    import hashlib
    import random
    import re

    from gnark_tpu import fields
    from gnark_tpu.backend import kzg, plonk
    from gnark_tpu.backend.solidity import export_plonk_verifier
    from gnark_tpu.ec import host
    from gnark_tpu.frontend import Circuit, Public, Secret, \
        compile_circuit, witness
    from gnark_tpu.frontend.scs import SCSBuilder
    from gnark_tpu.pairing import get_pairing

    class Cubic(Circuit):
        x: Secret
        y: Public

        def define(self, api):
            x3 = api.mul(self.x, self.x, self.x)
            api.assert_is_equal(api.add(x3, self.x, 5), self.y)

    cs = compile_circuit(Cubic(), fields.BN254_FR,
                         builder_cls=SCSBuilder)
    srs = kzg.setup_srs("bn254", 64, rng=random.Random(77))
    pk, vk = plonk.setup(cs, srs)
    pub, sec = witness(Cubic(x=3, y=35), cs)
    proof = plonk.prove(cs, pk, pub, sec, rng=random.Random(78))
    assert plonk.verify(proof, vk, pub)

    sol = export_plonk_verifier(vk)
    assert sol.count("{") == sol.count("}")
    C = {m.group(1): int(m.group(2))
         for m in re.finditer(r"uint256 constant (\w+) = (\d+);", sol)}
    R, P = C["R"], C["P"]
    f1 = host.Fp(P)

    prw = ([*proof.lro[0], *proof.lro[1], *proof.lro[2],
            *proof.z, *proof.h[0], *proof.h[1], *proof.h[2],
            *proof.batched_h] + list(proof.claimed)
           + [*proof.z_shift_h, proof.zu])
    assert len(prw) == 25

    def be(v):
        return int(v).to_bytes(32, "big")

    def simulate(prw, pubs):
        d = b"".join(be(C[k]) for k in (
            "S1_X", "S1_Y", "S2_X", "S2_Y", "S3_X", "S3_Y",
            "QL_X", "QL_Y", "QR_X", "QR_Y", "QM_X", "QM_Y",
            "QO_X", "QO_Y", "QK_X", "QK_Y")) + be(1)
        for v in pubs:
            d += be(v % R)
        d += b"".join(be(prw[i]) for i in range(6))
        # gnark fiat-shamir: raw digest chaining (gnark_fs.py)
        gd = hashlib.sha256(b"gamma" + d).digest()
        gamma = int.from_bytes(gd, "big") % R
        bd = hashlib.sha256(b"beta" + gd).digest()
        beta = int.from_bytes(bd, "big") % R
        ad = hashlib.sha256(
            b"alpha" + bd + be(prw[6]) + be(prw[7])).digest()
        alpha = int.from_bytes(ad, "big") % R
        zeta = int.from_bytes(hashlib.sha256(
            b"zeta" + ad
            + b"".join(be(prw[i]) for i in range(8, 14))).digest(),
            "big") % R

        N, NINV, OM, U = C["N"], C["N_INV"], C["OMEGA"], C["COSET_U"]
        zn = pow(zeta, N, R)
        zh = (zn - 1) % R
        l1 = zh * pow((zeta - 1) % R, -1, R) % R * NINV % R
        pi = 0
        accw = 1
        for v in [1] + [x % R for x in pubs]:
            li = zh * pow((zeta - accw) % R, -1, R) % R * NINV % R \
                * accw % R
            pi = (pi + li * v) % R
            accw = accw * OM % R
        a2l1 = alpha * alpha % R * l1 % R
        lin_z, lz, rz, oz, s1z, s2z = prw[16:22]
        zu = prw[24]
        t = (lz + beta * s1z + gamma) % R
        t = t * ((rz + beta * s2z + gamma) % R) % R
        t = t * ((oz + gamma) % R) % R * alpha % R * zu % R
        want = (R - (pi - a2l1 + t) % R) % R
        if lin_z != want:
            return False

        t1 = (lz + beta * s1z + gamma) % R
        t2 = (rz + beta * s2z + gamma) % R
        s1s = alpha * beta % R * t1 % R * t2 % R * zu % R
        bz = beta * zeta % R
        idp = (lz + bz + gamma) % R
        idp = idp * ((rz + U * bz + gamma) % R) % R
        idp = idp * ((oz + U * U % R * bz + gamma) % R) % R
        coeff_z = (a2l1 - alpha * idp) % R
        zp2 = zn * zeta % R * zeta % R
        nzh = (R - zh) % R

        def pt(xk, yk):
            x, y = C[xk], C[yk]
            return host.INF if x == 0 and y == 0 else (x, y)

        def mul(Pp, s):
            return host.ec_mul(f1, Pp, s % R)

        acc = mul(pt("QL_X", "QL_Y"), lz)
        for (Pp, sc) in [
                (pt("QR_X", "QR_Y"), rz),
                (pt("QM_X", "QM_Y"), lz * rz % R),
                (pt("QO_X", "QO_Y"), oz),
                (pt("QK_X", "QK_Y"), 1),
                (pt("S3_X", "S3_Y"), s1s),
                ((prw[6], prw[7]), coeff_z),
                ((prw[8], prw[9]), nzh),
                ((prw[10], prw[11]), nzh * zp2 % R),
                ((prw[12], prw[13]), nzh * zp2 % R * zp2 % R)]:
            acc = host.ec_add(f1, acc, mul(Pp, sc))

        fold = int.from_bytes(hashlib.sha256(
            b"gamma" + be(zeta)
            + be(acc[0]) + be(acc[1])
            + b"".join(be(prw[i]) for i in range(6))
            + b"".join(be(C[k]) for k in ("S1_X", "S1_Y", "S2_X", "S2_Y"))
            + b"".join(be(prw[16 + i]) for i in range(6))
            + be(zu)).digest(), "big") % R

        fc, fv = acc, lin_z
        chp = 1
        dpts = [(prw[0], prw[1]), (prw[2], prw[3]), (prw[4], prw[5]),
                pt("S1_X", "S1_Y"), pt("S2_X", "S2_Y")]
        for i in range(5):
            chp = chp * fold % R
            fc = host.ec_add(f1, fc, mul(dpts[i], chp))
            fv = (fv + chp * prw[17 + i]) % R

        g2 = ((C["G2_X0"], C["G2_X1"]), (C["G2_Y0"], C["G2_Y1"]))
        tau2 = ((C["TAU2_X0"], C["TAU2_X1"]),
                (C["TAU2_Y0"], C["TAU2_Y1"]))
        pr_engine = get_pairing("bn254")

        def kzg_open_ok(cpt, v, z, w):
            fpt = host.ec_add(f1, cpt,
                              host.ec_neg(f1, mul((1, 2), v)))
            fpt = host.ec_add(f1, fpt, mul(w, z))
            res = pr_engine.pairing_product(
                [(fpt, g2), (host.ec_neg(f1, w), tau2)])
            return pr_engine.ext.eq(res, pr_engine.gt_one())

        if not kzg_open_ok(fc, fv, zeta, (prw[14], prw[15])):
            return False
        return kzg_open_ok((prw[6], prw[7]), zu, OM * zeta % R,
                           (prw[22], prw[23]))

    pubs = list(pub)
    assert simulate(prw, pubs), "contract semantics reject a valid proof"
    bad = list(prw)
    bad[16] = (bad[16] + 1) % R
    assert not simulate(bad, pubs)
    assert not simulate(prw, [v + 1 for v in pubs])


def test_groth16_commitment_export_and_simulate():
    """Commitment-circuit contract (reference solidity.go:413-646):
    prove with the evm commitment hash, re-run the contract's two
    pairing calls + sha256 hash host-side."""
    import hashlib

    from tests.test_groth16 import CommitCircuit

    cs = compile_circuit(CommitCircuit(), fields.BN254_FR)
    assert cs.commitments, "circuit must carry a BSB22 commitment"
    rng = random.Random(99)
    pk, vk = groth16.setup(cs, "bn254", rng=rng)
    pub, sec = witness(CommitCircuit(x=5, y=25), cs)
    proof = groth16.prove(cs, pk, pub, sec, rng=rng,
                          recursion_friendly="evm")
    assert groth16.verify(proof, vk, pub, recursion_friendly="evm")

    src = solidity.export_groth16_verifier(vk)
    assert "SIGMA0_X1" in src and "sha256(abi.encodePacked" in src
    assert "uint256[2] calldata cm" in src

    # --- simulate the contract host-side -----------------------------
    curve = vk.curve
    q = curve.fr.modulus
    f1 = curve.host_fp
    pairing = get_pairing("bn254")
    C = proof.commitments[0]
    pok = proof.poks[0]

    # pairing call 1: e(-pok, g2) * e(C, sigma) == 1
    chk = pairing.pairing_product([
        (host.ec_neg(f1, pok), tuple(curve.g2)),
        (C, vk.commitment_g2_sigma[0])])
    assert pairing.ext.eq(chk, pairing.gt_one())

    # cmVal = sha256(Cx || Cy) % R (the contract's hash)
    cm_val = int.from_bytes(hashlib.sha256(
        C[0].to_bytes(32, "big") + C[1].to_bytes(32, "big")).digest(),
        "big") % q

    vkx = vk.g1_k[0]
    for v, pt in zip(list(pub) + [cm_val], vk.g1_k[1:]):
        vkx = host.ec_add(f1, vkx, host.ec_mul(f1, pt, v % q))
    vkx = host.ec_add(f1, vkx, C)
    res = pairing.pairing_product([
        (host.ec_neg(f1, proof.ar), proof.bs),
        (vk.g1_alpha, vk.g2_beta),
        (vkx, vk.g2_gamma),
        (proof.krs, vk.g2_delta)])
    assert pairing.ext.eq(res, pairing.gt_one())

    # wrong public input fails the same equation
    vkx_bad = vk.g1_k[0]
    for v, pt in zip([26, cm_val], vk.g1_k[1:]):
        vkx_bad = host.ec_add(f1, vkx_bad, host.ec_mul(f1, pt, v))
    vkx_bad = host.ec_add(f1, vkx_bad, C)
    res = pairing.pairing_product([
        (host.ec_neg(f1, proof.ar), proof.bs),
        (vk.g1_alpha, vk.g2_beta),
        (vkx_bad, vk.g2_gamma),
        (proof.krs, vk.g2_delta)])
    assert not pairing.ext.eq(res, pairing.gt_one())
