"""Serialization & round-trip helpers (reference io/ + marshal layers)."""

from gnark_tpu.io.serialize import (
    dump_cs, load_cs, write_witness, read_witness,
    dump_groth16_proof, load_groth16_proof,
    dump_groth16_vk, load_groth16_vk,
    dump_plonk_proof, load_plonk_proof,
)


def roundtrip_check(obj, dump, load, eq=None) -> bool:
    """Serialization round-trip test helper (reference io/roundtrip.go)."""
    data = dump(obj)
    back = load(data)
    data2 = dump(back)
    if data != data2:
        return False
    return eq(obj, back) if eq else True


__all__ = ["dump_cs", "load_cs", "write_witness", "read_witness",
           "dump_groth16_proof", "load_groth16_proof",
           "dump_groth16_vk", "load_groth16_vk",
           "dump_plonk_proof", "load_plonk_proof", "roundtrip_check"]
