"""Fast binary (de)serialization of proving keys and SRS + disk cache.

Analog of the reference's WriteDump/ReadDump unsafe-fast paths
(backend/groth16/groth16.go:54-78) and the test/unsafekzg SRS disk
cache (kzgsrs.go:44-60, WithFSCache): npz containers of the device
limb arrays plus fixed-width big-endian host integers — no point
re-validation on load (keys are trusted local artifacts; PROOFS go
through the validated gnark_tpu.io.serialize path instead).
"""

from __future__ import annotations

import io as _io
import json
import os
import pathlib

import numpy as np

from gnark_tpu.ec import curves as curves_mod
from gnark_tpu.ec import host

_FLAG_INF = 1


def _ints_to_arr(vals, nbytes: int) -> np.ndarray:
    out = np.zeros((len(vals), nbytes), dtype=np.uint8)
    for i, v in enumerate(vals):
        out[i] = np.frombuffer(int(v).to_bytes(nbytes, "big"), np.uint8)
    return out


def _arr_to_ints(arr) -> list:
    return [int.from_bytes(bytes(row), "big") for row in arr]


def _pts_to_arr(pts, nbytes: int) -> np.ndarray:
    """Host G1/G2 points -> (n, 1 + k*nbytes) rows (flag + coords).
    G2-over-Fp2 coords are (c0, c1) tuples; flattened."""
    rows = []
    for P in pts:
        if P is host.INF:
            rows.append(b"\x01")
        else:
            flat = []
            for c in P:
                if isinstance(c, tuple):
                    flat += [c[0], c[1]]
                else:
                    flat.append(c)
            rows.append(b"\x00" + b"".join(
                int(v).to_bytes(nbytes, "big") for v in flat))
    width = max(len(r) for r in rows)
    out = np.zeros((len(rows), width), dtype=np.uint8)
    for i, r in enumerate(rows):
        out[i, :len(r)] = np.frombuffer(r, np.uint8)
    return out


def _arr_to_pts(arr, nbytes: int, fp2: bool):
    pts = []
    for row in arr:
        b = bytes(row)
        if b[0] == _FLAG_INF:
            pts.append(host.INF)
            continue
        body = b[1:]
        vals = [int.from_bytes(body[i * nbytes:(i + 1) * nbytes], "big")
                for i in range(len(body) // nbytes)]
        if fp2:
            pts.append(((vals[0], vals[1]), (vals[2], vals[3])))
        else:
            pts.append((vals[0], vals[1]))
    return pts


def _dev_out(d: dict, prefix: str, triple):
    x, y, inf = triple
    d[prefix + "_x"] = np.asarray(x)
    d[prefix + "_y"] = np.asarray(y)
    d[prefix + "_inf"] = np.asarray(inf)


def _dev_in(z, prefix: str):
    import jax.numpy as jnp
    return (jnp.asarray(z[prefix + "_x"]), jnp.asarray(z[prefix + "_y"]),
            jnp.asarray(z[prefix + "_inf"]))


# ---------------------------------------------------------------------------
# Groth16 ProvingKey
# ---------------------------------------------------------------------------

def dump_groth16_pk(pk) -> bytes:
    nb = -(-pk.curve.fp.modulus.bit_length() // 8)
    d = {}
    for name in ("g1_a", "g1_b", "g1_z", "g1_k", "g2_b"):
        _dev_out(d, name, getattr(pk, name))
    host_pts = [pk.g1_alpha, pk.g1_beta, pk.g1_delta]
    d["host_g1"] = _pts_to_arr(host_pts, nb)
    d["host_g2"] = _pts_to_arr([pk.g2_beta, pk.g2_delta], nb)
    meta = {"curve": pk.curve.name, "domain_n": pk.domain_n,
            "nb_ck": len(pk.commitment_keys)}
    for ci, ck in enumerate(pk.commitment_keys):
        d[f"ck{ci}_basis"] = _pts_to_arr(ck.basis, nb)
        d[f"ck{ci}_basis_sig"] = _pts_to_arr(ck.basis_exp_sigma, nb)
        d[f"ck{ci}_g2_sigma"] = _pts_to_arr([ck.g2_sigma], nb)
        meta[f"ck{ci}_wires"] = list(ck.wires)
    d["meta"] = np.frombuffer(json.dumps(meta).encode(), np.uint8)
    buf = _io.BytesIO()
    np.savez(buf, **d)
    return buf.getvalue()


def load_groth16_pk(data: bytes):
    from gnark_tpu.backend.groth16 import CommitmentKey, ProvingKey
    z = np.load(_io.BytesIO(data))
    meta = json.loads(bytes(z["meta"]).decode())
    curve = curves_mod.CURVES[meta["curve"]]
    nb = -(-curve.fp.modulus.bit_length() // 8)
    fp2 = curve.g2_over_fp2
    hg1 = _arr_to_pts(z["host_g1"], nb, False)
    hg2 = _arr_to_pts(z["host_g2"], nb, fp2)
    cks = []
    for ci in range(meta["nb_ck"]):
        cks.append(CommitmentKey(
            wires=tuple(meta[f"ck{ci}_wires"]),
            basis=_arr_to_pts(z[f"ck{ci}_basis"], nb, False),
            basis_exp_sigma=_arr_to_pts(z[f"ck{ci}_basis_sig"], nb, False),
            g2_sigma=_arr_to_pts(z[f"ck{ci}_g2_sigma"], nb, fp2)[0]))
    return ProvingKey(
        curve=curve, domain_n=meta["domain_n"],
        g1_a=_dev_in(z, "g1_a"), g1_b=_dev_in(z, "g1_b"),
        g1_z=_dev_in(z, "g1_z"), g1_k=_dev_in(z, "g1_k"),
        g2_b=_dev_in(z, "g2_b"),
        g1_alpha=hg1[0], g1_beta=hg1[1], g1_delta=hg1[2],
        g2_beta=hg2[0], g2_delta=hg2[1],
        commitment_keys=cks)


# ---------------------------------------------------------------------------
# KZG SRS (+ disk cache) and PLONK keys
# ---------------------------------------------------------------------------

def dump_srs(srs) -> bytes:
    nb = -(-srs.curve.fp.modulus.bit_length() // 8)
    d = {}
    _dev_out(d, "g1", srs.g1_powers)
    d["g1_host"] = _pts_to_arr(srs.g1_host, nb)
    d["g2"] = _pts_to_arr([srs.g2_gen, srs.g2_tau], nb)
    d["meta"] = np.frombuffer(
        json.dumps({"curve": srs.curve.name}).encode(), np.uint8)
    buf = _io.BytesIO()
    np.savez(buf, **d)
    return buf.getvalue()


def load_srs(data: bytes):
    from gnark_tpu.backend.kzg import SRS
    z = np.load(_io.BytesIO(data))
    meta = json.loads(bytes(z["meta"]).decode())
    curve = curves_mod.CURVES[meta["curve"]]
    nb = -(-curve.fp.modulus.bit_length() // 8)
    g2 = _arr_to_pts(z["g2"], nb, curve.g2_over_fp2)
    return SRS(curve=curve, g1_powers=_dev_in(z, "g1"),
               g1_host=_arr_to_pts(z["g1_host"], nb, False),
               g2_gen=g2[0], g2_tau=g2[1])


def srs_cached(curve_name: str, size: int, cache_dir=None, rng=None):
    """Disk-cached insecure SRS (reference test/unsafekzg WithFSCache,
    kzgsrs.go:44-60): generate once per (curve, size), reuse across
    processes. The cached SRS is UNSAFE (known tau) — test/dev only."""
    from gnark_tpu.backend.kzg import setup_srs
    cache_dir = pathlib.Path(cache_dir or os.path.expanduser(
        "~/.cache/gnark_tpu/kzg"))
    cache_dir.mkdir(parents=True, exist_ok=True)
    f = cache_dir / f"srs_{curve_name}_{size}.npz"
    if f.exists():
        return load_srs(f.read_bytes())
    srs = setup_srs(curve_name, size, rng=rng)
    tmp = f.with_suffix(".tmp")
    tmp.write_bytes(dump_srs(srs))
    os.replace(tmp, f)
    return srs


def dump_plonk_pk(pk) -> bytes:
    """PLONK proving key incl. its SRS (one self-contained artifact)."""
    q = pk.vk.curve.fr.modulus
    nbr = -(-q.bit_length() // 8)
    d = {"srs": np.frombuffer(dump_srs(pk.srs), np.uint8)}
    int_fields = ("ql", "qr", "qm", "qo", "qk", "ql_coeffs", "qr_coeffs",
                  "qm_coeffs", "qo_coeffs", "qk_coeffs", "s1_coeffs",
                  "s2_coeffs", "s3_coeffs", "s1_vals", "s2_vals",
                  "s3_vals", "perm")
    for name in int_fields:
        vals = getattr(pk, name)
        if name == "perm":
            d[name] = np.asarray(vals, dtype=np.int64)
        else:
            d[name] = _ints_to_arr(vals, nbr)
    meta = {"nb_qcp": len(pk.qcp_coeffs)}
    for i, c in enumerate(pk.qcp_coeffs):
        d[f"qcp{i}"] = _ints_to_arr(c, nbr)
    d["vk"] = np.frombuffer(dump_plonk_vk(pk.vk), np.uint8)
    d["meta"] = np.frombuffer(json.dumps(meta).encode(), np.uint8)
    buf = _io.BytesIO()
    np.savez(buf, **d)
    return buf.getvalue()


def load_plonk_pk(data: bytes):
    from gnark_tpu.backend.plonk import PlonkProvingKey
    z = np.load(_io.BytesIO(data))
    meta = json.loads(bytes(z["meta"]).decode())
    vk = load_plonk_vk(bytes(z["vk"]))
    srs = load_srs(bytes(z["srs"]))
    kw = {}
    for name in ("ql", "qr", "qm", "qo", "qk", "ql_coeffs", "qr_coeffs",
                 "qm_coeffs", "qo_coeffs", "qk_coeffs", "s1_coeffs",
                 "s2_coeffs", "s3_coeffs", "s1_vals", "s2_vals",
                 "s3_vals"):
        kw[name] = _arr_to_ints(z[name])
    perm = [int(v) for v in z["perm"]]
    qcp = [_arr_to_ints(z[f"qcp{i}"]) for i in range(meta["nb_qcp"])]
    return PlonkProvingKey(vk=vk, srs=srs, perm=perm, qcp_coeffs=qcp,
                           **kw)


def dump_plonk_vk(vk) -> bytes:
    nb = -(-vk.curve.fp.modulus.bit_length() // 8)
    d = {}
    d["g1"] = _pts_to_arr(
        list(vk.s_comm) + [vk.ql_c, vk.qr_c, vk.qm_c, vk.qo_c, vk.qk_c]
        + list(vk.qcp_c), nb)
    d["g2"] = _pts_to_arr([vk.g2_gen, vk.g2_tau], nb)
    meta = {"curve": vk.curve.name, "size": vk.size,
            "generator": hex(vk.generator),
            "coset_shift": hex(vk.coset_shift),
            "nb_public": vk.nb_public,
            "nb_qcp": len(vk.qcp_c),
            "commitment_rows": list(vk.commitment_rows)}
    d["meta"] = np.frombuffer(json.dumps(meta).encode(), np.uint8)
    buf = _io.BytesIO()
    np.savez(buf, **d)
    return buf.getvalue()


def load_plonk_vk(data: bytes):
    from gnark_tpu.backend.plonk import PlonkVerifyingKey
    z = np.load(_io.BytesIO(data))
    meta = json.loads(bytes(z["meta"]).decode())
    curve = curves_mod.CURVES[meta["curve"]]
    nb = -(-curve.fp.modulus.bit_length() // 8)
    g1 = _arr_to_pts(z["g1"], nb, False)
    g2 = _arr_to_pts(z["g2"], nb, curve.g2_over_fp2)
    nq = meta["nb_qcp"]
    return PlonkVerifyingKey(
        curve=curve, size=meta["size"],
        generator=int(meta["generator"], 16),
        coset_shift=int(meta["coset_shift"], 16),
        nb_public=meta["nb_public"],
        s_comm=g1[:3], ql_c=g1[3], qr_c=g1[4], qm_c=g1[5], qo_c=g1[6],
        qk_c=g1[7], qcp_c=g1[8:8 + nq],
        commitment_rows=meta["commitment_rows"],
        g2_gen=g2[0], g2_tau=g2[1])
