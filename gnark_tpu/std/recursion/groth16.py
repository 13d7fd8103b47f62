"""In-circuit Groth16 verifier for BLS12-377 proofs inside BW6-761
circuits (the native 2-chain; reference std/recursion/groth16
verifier.go:45-620 — that one is generic over emulated curves, this
one targets the 2-chain where inner Fp == outer Fr so all arithmetic
is native).

The inner VerifyingKey embeds as circuit CONSTANTS (its Miller-loop
pair e(-alpha, beta) folds entirely at compile time); the proof and
public inputs are witness variables. The verification equation

    e(Ar, Bs) * e(ksum, -gamma) * e(Krs, -delta) * e(-alpha, beta) == 1

is asserted with one multi-Miller loop + one final exponentiation
(std/algebra/pairing_bls12377; our pairing is e^3 — a fixed odd power,
equation unchanged).
"""

from __future__ import annotations

from gnark_tpu.ec import host
from gnark_tpu.std.algebra.pairing_bls12377 import PairingCircuit
from gnark_tpu.std.algebra.sw_bls12377 import G1Circuit, G2Circuit


def proof_witness(proof):
    """Flatten a backend.groth16.Proof (bls12_377) into the assignment
    dict fields expected by a circuit using assert_proof. Commitment
    points (BSB22) flatten to cm{i}_x/y, pok{i}_x/y."""
    (arx, ary), (krx, kry) = proof.ar, proof.krs
    (bx0, bx1), (by0, by1) = proof.bs
    out = dict(ar_x=arx, ar_y=ary, krs_x=krx, krs_y=kry,
               bs_x0=bx0, bs_x1=bx1, bs_y0=by0, bs_y1=by1)
    for i, (C, pok) in enumerate(zip(proof.commitments, proof.poks)):
        out[f"cm{i}_x"], out[f"cm{i}_y"] = C
        out[f"pok{i}_x"], out[f"pok{i}_y"] = pok
    return out


def assert_proof(api, vk, proof_vars, publics,
                 separate_pok: bool = False):
    """Assert a Groth16 proof verifies against the CONSTANT inner vk.

    vk: backend.groth16.VerifyingKey over bls12_377 (host values).
    proof_vars: dict with ar_x/ar_y, bs_x0/bs_x1/bs_y0/bs_y1,
        krs_x/krs_y circuit variables.
    publics: inner public inputs as circuit variables (excluding the
        constant-one wire).
    separate_pok: check each Pedersen PoK in its OWN pairing product
        like the reference's pedersen.AssertCommitment
        (std/commitments/pedersen/verifier.go:57-72) — one extra
        multi-pairing per commitment instead of the default rho-folded
        merge into the main product (cheaper, same soundness via the
        unpredictable rho linear combination).
    """
    assert vk.curve.name == "bls12_377", "2-chain inner must be bls12_377"
    nb_cm = len(vk.commitment_g2_sigma)
    if len(publics) != len(vk.g1_k) - 1 - nb_cm:
        raise ValueError(
            f"want {len(vk.g1_k) - 1 - nb_cm} inner publics")
    commitments = proof_vars.get("commitments", [])
    poks = proof_vars.get("poks", [])
    assert len(commitments) == nb_cm and len(poks) == nb_cm, \
        "commitment circuits need the inner proof's BSB22 points " \
        "(prove with recursion_friendly=True)"

    g1 = G1Circuit(api)
    g2 = G2Circuit(api)
    pc = PairingCircuit(api)

    ar = (proof_vars["ar_x"], proof_vars["ar_y"])
    krs = (proof_vars["krs_x"], proof_vars["krs_y"])
    bs = ((proof_vars["bs_x0"], proof_vars["bs_x1"]),
          (proof_vars["bs_y0"], proof_vars["bs_y1"]))

    # on-curve checks (gnark checks on unmarshal; subgroup checks of
    # witness points are enforced by the pairing equation soundness
    # for G1 and left to the cofactor-clearing TODO for Bs)
    g1.assert_on_curve(ar)
    g1.assert_on_curve(krs)
    g2.assert_on_curve(bs)
    for P in list(commitments) + list(poks):
        g1.assert_on_curve(P)

    r_mod = vk.curve.fr.modulus
    rbits = r_mod.bit_length()

    def trunc(c):
        """Canonical-decomposition truncation of a MiMC output to
        rbits-8 bits (mirrors backend _hash_to_field recursion mode)."""
        pbits = api.field().bit_length()
        bits = api.to_binary(c, pbits)
        acc = 1
        for i in range(len(bits) - 1, -1, -1):
            if ((api.field() - 1) >> i) & 1:
                acc = api.mul(acc, bits[i])
            else:
                api.assert_is_equal(api.mul(acc, bits[i]), 0)
        return api.from_binary(bits[:rbits - 8])

    # commitment wire values: MiMC hash-to-field of each commitment
    # (requires the inner proof made with recursion_friendly=True)
    hashed = []
    if nb_cm:
        from gnark_tpu.std.hash.mimc import MiMCGadget
        for C in commitments:
            h = MiMCGadget(api, "bw6_761_fr")
            h.write(int.from_bytes(b"BSB22-Groth16", "big"))
            h.write(C[0], C[1])
            hashed.append(trunc(h.sum()))

    # ksum = K[0] + sum extended[i] * K[i+1] + sum commitments
    nbits = vk.curve.fr.bits
    ksum = g1.msm_const_bases(vk.g1_k[1:], list(publics) + hashed,
                              nbits)
    k0 = vk.g1_k[0]
    if k0 is not host.INF:
        ksum = g1.add_distinct(ksum, k0)
    for C in commitments:
        ksum = g1.add_distinct(ksum, C)

    pairs = [
        (ar, bs),
        (ksum, vk.g2_gamma_neg),
        (krs, vk.g2_delta_neg),
        ((vk.g1_alpha[0], (-vk.g1_alpha[1]) % vk.curve.fp.modulus),
         vk.g2_beta),                      # constant pair: folds
    ]
    if nb_cm and separate_pok:
        # reference parity: pedersen.AssertCommitment — each PoK in
        # its own pairing check
        from gnark_tpu.std.commitments.pedersen import assert_pok_377
        for C, pok, sig in zip(commitments, poks,
                               vk.commitment_g2_sigma):
            assert_pok_377(api, C, pok, sig)
    elif nb_cm:
        # fold the Pedersen PoK equations e(-pok,g2)*e(C,sigma) == 1
        # into the main product with an unpredictable rho challenge
        # (random linear combination of verified-to-one equations)
        from gnark_tpu.std.hash.mimc import MiMCGadget
        rh = MiMCGadget(api, "bw6_761_fr")
        rh.write(int.from_bytes(b"groth16-pok-fold", "big"))
        for P in [ar, krs] + list(commitments) + list(poks):
            rh.write(P[0], P[1])
        rho = trunc(rh.sum())
        rho_bits = api.to_binary(rho, rbits - 8)
        for C, pok, sig in zip(commitments, poks,
                               vk.commitment_g2_sigma):
            rc = g1.scalar_mul_bits(C, rho_bits)
            rpok = g1.scalar_mul_bits(pok, rho_bits)
            pairs.append((g1.neg(rpok), tuple(vk.curve.g2)))
            pairs.append((rc, sig))
    pc.assert_pairing_product_is_one(pairs)


# -- emulated variant: BN254 proofs inside a BN254-scalar circuit ------------

def assert_proof_bn254(api, vk, proof_vars, publics):
    """Assert a BN254 Groth16 proof verifies against the CONSTANT
    inner vk — the EMULATED recursion path (reference
    std/recursion/groth16/verifier.go with sw_bn254; self-recursion:
    inner Fr == outer Fr).

    proof_vars: dict of emulated-Fp limb variables already assembled
        into Elements by the caller via `load_proof_bn254`, with keys
        ar/krs (G1 pairs) and bs (G2Point).
    publics: native circuit variables (inner publics, no ONE wire).

    Equation: e(Ar,Bs) * e(ksum,-gamma) * e(Krs,-delta) * e(-alpha,beta)
    == 1, with -gamma/-delta as fixed-line constants and the constant
    pair e(-alpha,beta) folded to a host Miller value."""
    from gnark_tpu.pairing.ate import get_ate
    from gnark_tpu.std.algebra.pairing_bn254 import FixedG2, PairingBN254
    from gnark_tpu.std.algebra.sw_bn254 import G1EmulatedBN254

    assert vk.curve.name == "bn254", "emulated path expects bn254 inner"
    nb_cm = len(vk.commitment_g2_sigma)
    commitments = proof_vars.get("commitments", [])
    poks = proof_vars.get("poks", [])
    assert len(commitments) == nb_cm and len(poks) == nb_cm, \
        "commitment circuits need the inner proof's BSB22 points " \
        '(prove with recursion_friendly="self")'
    if len(publics) != len(vk.g1_k) - 1 - nb_cm:
        raise ValueError(
            f"want {len(vk.g1_k) - 1 - nb_cm} inner publics")

    pr = PairingBN254(api)
    g1 = G1EmulatedBN254(api, pr.fe)

    ar, krs, bs = proof_vars["ar"], proof_vars["krs"], proof_vars["bs"]
    pr.assert_on_g1(ar)
    pr.assert_on_g1(krs)
    pr.assert_on_g2_curve(bs)
    pr.assert_in_g2_subgroup(bs)
    for P in list(commitments) + list(poks):
        pr.assert_on_g1(P)

    r_mod = vk.curve.fr.modulus
    rbits_ = r_mod.bit_length()

    # commitment wire values: the backend's recursion_friendly="self"
    # hash — MiMC over the curve's OWN fr (the native field here) of
    # the canonical coordinate limbs, truncated to rbits-8
    # (backend/groth16._hash_to_field + transcript.mimc_point_writes)
    hashed = []
    if nb_cm:
        from gnark_tpu.std.hash.mimc import MiMCGadget

        def trunc(c):
            pbits = api.field().bit_length()
            bits = api.to_binary(c, pbits)
            acc = 1
            for i in range(len(bits) - 1, -1, -1):
                if ((api.field() - 1) >> i) & 1:
                    acc = api.mul(acc, bits[i])
                else:
                    api.assert_is_equal(api.mul(acc, bits[i]), 0)
            return api.from_binary(bits[:rbits_ - 8])

        for C in commitments:
            h = MiMCGadget(api, "bn254_fr")
            h.write(int.from_bytes(b"BSB22-Groth16", "big"))
            cx = pr.fe.reduce_strict(C[0])
            cy = pr.fe.reduce_strict(C[1])
            for l in cx.limbs + cy.limbs:
                h.write(l)
            hashed.append(trunc(h.sum()))

    nbits = vk.curve.fr.bits
    ksum = g1.msm_const_bases(vk.g1_k[1:], list(publics) + hashed,
                              nbits)
    k0 = vk.g1_k[0]
    if k0 is not host.INF:
        ksum = g1.add_distinct(ksum, g1.from_const(k0))
    for C in commitments:
        ksum = g1.add_distinct(ksum, C)

    # constant pair folds to one host Miller value (bit-exact with the
    # circuit loop: tests/test_pairing_bn254_circuit.py pins that)
    ate = get_ate("bn254")
    p = vk.curve.fp.modulus
    neg_alpha = (vk.g1_alpha[0], (-vk.g1_alpha[1]) % p)
    ml_const = ate.miller_loop(neg_alpha, vk.g2_beta)

    pairs = [
        (ar, bs),
        (ksum, FixedG2(vk.g2_gamma_neg)),
        (krs, FixedG2(vk.g2_delta_neg)),
    ]
    if nb_cm:
        # fold each Pedersen PoK equation e(-pok,g2)*e(C,sigma) == 1
        # into the product with an unpredictable rho (random linear
        # combination — the 2-chain path's scheme, above)
        from gnark_tpu.std.hash.mimc import MiMCGadget
        rh = MiMCGadget(api, "bn254_fr")
        rh.write(int.from_bytes(b"groth16-pok-fold", "big"))
        for P in [ar, krs] + list(commitments) + list(poks):
            for c in (P[0], P[1]):
                cc = pr.fe.reduce_strict(c)
                for l in cc.limbs:
                    rh.write(l)
        rho = trunc(rh.sum())
        # rho as 64-bit limb vars for the GLV ladder (~3x cheaper
        # than the plain 246-bit ladder)
        from gnark_tpu.std.algebra.sw_emulated import (BN254_SW,
                                                       EmulatedCurve)
        from gnark_tpu.std.math import emulated as _emu
        rho_bits = api.to_binary(rho, rbits_ - 8)
        rho_limbs = []
        for j in range(_emu.K):
            seg = rho_bits[64 * j:64 * (j + 1)]
            rho_limbs.append(api.from_binary(seg) if seg else 0)
        cur = EmulatedCurve(api, BN254_SW)
        for C, pok, sig in zip(commitments, poks,
                               vk.commitment_g2_sigma):
            rc = cur.scalar_mul_glv(C, rho_limbs)
            rpok = cur.scalar_mul_glv(pok, rho_limbs)
            pairs.append((g1.neg(rpok), FixedG2(tuple(vk.curve.g2))))
            pairs.append((rc, FixedG2(sig)))

    f = pr.miller_loop(pairs)
    f = pr.f12.mul(f, pr.f12.from_const(ml_const))
    f = pr.final_exponentiation(f)
    pr.f12.assert_one(f)


def load_proof_bn254(fe, limb_vars, nb_commitments: int = 0):
    """Assemble proof Elements from flat limb variables in the order
    [ar.x, ar.y, krs.x, krs.y, bs.x0, bs.x1, bs.y0, bs.y1,
     C_i.x, C_i.y ..., pok_i.x, pok_i.y ...]."""
    from gnark_tpu.std.algebra.pairing_bn254 import G2Point
    from gnark_tpu.std.math import emulated as emu
    k = emu.K
    n_el = 8 + 4 * nb_commitments
    els = [fe.from_limb_vars(limb_vars[k * i:k * (i + 1)])
           for i in range(n_el)]
    cms = [(els[8 + 2 * i], els[9 + 2 * i])
           for i in range(nb_commitments)]
    off = 8 + 2 * nb_commitments
    pks = [(els[off + 2 * i], els[off + 2 * i + 1])
           for i in range(nb_commitments)]
    return dict(ar=(els[0], els[1]), krs=(els[2], els[3]),
                bs=G2Point((els[4], els[5]), (els[6], els[7])),
                commitments=cms, poks=pks)


def proof_witness_bn254(proof):
    """Flatten a bn254 backend proof into limb assignments for
    load_proof_bn254's flat layout (incl. commitments + poks)."""
    from gnark_tpu.std.math import emulated as emu

    def limbs(v):
        return [(v >> (emu.B * i)) & emu.MASK for i in range(emu.K)]

    (arx, ary), (krx, kry) = proof.ar, proof.krs
    (bx0, bx1), (by0, by1) = proof.bs
    out = []
    for v in (arx, ary, krx, kry, bx0, bx1, by0, by1):
        out += limbs(v)
    for C in list(proof.commitments) + list(proof.poks):
        out += limbs(C[0]) + limbs(C[1])
    return out
