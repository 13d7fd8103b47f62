"""PLONK Solidity export for BSB22 commitment circuits (Qcp columns)
— the reference contract's commitment handling
(backend/plonk/bn254/solidity.go): in-contract gnark
fr/hash_to_field of the pi2 commitment, PI adjustment, Qcp fold.
Simulator-executed (no solc in-image), deriving everything from the
emitted .sol text."""

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
from gnark_tpu.utils.hash_to_field import hash_to_field


class Committed(Circuit):
    x: Secret
    y: Public

    def define(self, api):
        c = api.commit(self.x)
        api.assert_is_different(c, 0)
        x3 = api.mul(self.x, self.x, self.x)
        api.assert_is_equal(api.add(x3, self.x, 5), self.y)


def be(v):
    return int(v).to_bytes(32, "big")


def test_plonk_commitment_export_and_simulate():
    cs = compile_circuit(Committed(), fields.BN254_FR,
                         builder_cls=SCSBuilder)
    srs = kzg.setup_srs("bn254", 128, rng=random.Random(97))
    pk, vk = plonk.setup(cs, srs)
    pub, sec = witness(Committed(x=3, y=35), cs)
    proof = plonk.prove(cs, pk, pub, sec, rng=random.Random(98))
    assert plonk.verify(proof, vk, pub)
    assert len(vk.qcp_c) == 1

    sol = export_plonk_verifier(vk)
    assert sol.count("{") == sol.count("}")
    assert "_hashFr" in sol and "QCP0_X" in sol
    C = {m.group(1): int(m.group(2))
         for m in re.finditer(r"uint256 constant (\w+) = (\d+);", sol)}
    R, P = C["R"], C["P"]
    f1 = host.Fp(P)
    nc = 1

    prw = ([*proof.lro[0], *proof.lro[1], *proof.lro[2],
            *proof.z, *proof.h[0], *proof.h[1], *proof.h[2],
            *proof.batched_h] + list(proof.claimed[:6])
           + [*proof.z_shift_h, proof.zu]
           + [*proof.bsb22[0]] + list(proof.claimed[6:]))
    assert len(prw) == 25 + 3 * nc

    def hash_fr_sim(x, y):
        # the contract's _hashFr == gnark fr/hash_to_field
        return hash_to_field(be(x) + be(y), b"BSB22-Plonk", 1, R)[0]

    def simulate(prw, pubs):
        d = b"".join(be(C[k]) for k in (
            "S1_X", "S1_Y", "S2_X", "S2_Y", "S3_X", "S3_Y",
            "QL_X", "QL_Y", "QR_X", "QR_Y", "QM_X", "QM_Y",
            "QO_X", "QO_Y", "QK_X", "QK_Y", "QCP0_X", "QCP0_Y")) \
            + be(1)
        for v in pubs:
            d += be(v % R)
        d += b"".join(be(prw[i]) for i in range(6))
        gd = hashlib.sha256(b"gamma" + d).digest()
        gamma = int.from_bytes(gd, "big") % R
        bd = hashlib.sha256(b"beta" + gd).digest()
        beta = int.from_bytes(bd, "big") % R
        ad = hashlib.sha256(
            b"alpha" + bd + be(prw[25]) + be(prw[26])
            + be(prw[6]) + be(prw[7])).digest()
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
        # Qcp PI contribution at the commitment row
        wi = C["WI0"]
        li = zh * pow((zeta - wi) % R, -1, R) % R * NINV % R * wi % R
        pi = (pi + li * hash_fr_sim(prw[25], prw[26])) % R

        a2l1 = alpha * alpha % R * l1 % R
        lin_z, lz, rz, oz, s1z, s2z = prw[16:22]
        qcpz = prw[25 + 2 * nc]
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
                ((prw[12], prw[13]), nzh * zp2 % R * zp2 % R),
                ((prw[25], prw[26]), qcpz)]:
            acc = host.ec_add(f1, acc, mul(Pp, sc))

        fold = int.from_bytes(hashlib.sha256(
            b"gamma" + be(zeta)
            + be(acc[0]) + be(acc[1])
            + b"".join(be(prw[i]) for i in range(6))
            + b"".join(be(C[k]) for k in
                       ("S1_X", "S1_Y", "S2_X", "S2_Y",
                        "QCP0_X", "QCP0_Y"))
            + b"".join(be(prw[16 + i]) for i in range(6))
            + be(qcpz)
            + be(zu)).digest(), "big") % R

        fc, fv = acc, lin_z
        chp = 1
        dpts = [(prw[0], prw[1]), (prw[2], prw[3]), (prw[4], prw[5]),
                pt("S1_X", "S1_Y"), pt("S2_X", "S2_Y")]
        claims = [prw[17 + i] for i in range(5)]
        dpts.append(pt("QCP0_X", "QCP0_Y"))
        claims.append(qcpz)
        for i in range(6):
            chp = chp * fold % R
            fc = host.ec_add(f1, fc, mul(dpts[i], chp))
            fv = (fv + chp * claims[i]) % R

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
    bad2 = list(prw)
    bad2[25] = (bad2[25] + 1) % C["P"]   # tamper pi2 commitment
    assert not simulate(bad2, pubs)
    assert not simulate(prw, [v + 1 for v in pubs])
