"""Guards for bench.py's synthetic circuits (they run unattended in
the driver's bench; a drift here would silently zero a metric)."""

import sys

sys.path.insert(0, "/root/repo")


def test_square_chain_solves():
    from bench import _synth_square_chain
    from gnark_tpu.constraint import solve

    cs = _synth_square_chain(4, 8)
    assert cs.nb_constraints == 32
    q = cs.q
    secrets_in = [i + 2 for i in range(4)]
    sol = solve(cs, [], secrets_in)
    # last wire of chain 0 holds x0^(2^8); chain c occupies internal
    # wires [first_internal + c*8, first_internal + (c+1)*8)
    want = pow(2, 1 << 8, q)
    first_internal = cs.nb_public + cs.nb_secret
    assert sol.values[first_internal + 7] == want


def test_square_chain_levels_are_wide():
    from bench import _synth_square_chain

    cs = _synth_square_chain(16, 4)
    # 4 levels of 16 parallel instructions each
    assert len(cs.levels) == 4
    assert all(len(lv) == 16 for lv in cs.levels)


def test_rollup_incremental_merkle():
    """examples/rollup.MerkleTree must agree with the naive rebuild
    (guards the 1M-constraint bench secondary's host-side batch)."""
    import importlib.util
    import os

    os.environ["ROLLUP_DEPTH"] = "3"
    os.environ["ROLLUP_TXS"] = "2"
    spec = importlib.util.spec_from_file_location(
        "rollup_mod", os.path.join(os.path.dirname(__file__),
                                   "..", "examples", "rollup.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    leaves = [i * 7 + 1 for i in range(8)]
    t = mod.MerkleTree(leaves)
    assert t.root == mod.tree_root(list(leaves))
    for idx in (0, 3, 7):
        assert t.path(idx) == mod.tree_path(list(leaves), idx)
    t.update(5, 999)
    leaves[5] = 999
    assert t.root == mod.tree_root(leaves)
    assert t.path(2) == mod.tree_path(leaves, 2)


def test_ecdsa_example_compiles():
    """examples/ecdsa.py's circuit must stay in the GLV constraint
    class (~234k; the pre-GLV ladder was 2.57M)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "ecdsa_example", os.path.join(os.path.dirname(__file__),
                                      "..", "examples", "ecdsa.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    from gnark_tpu import fields
    from gnark_tpu.frontend import compile_circuit

    cs = compile_circuit(mod.EcdsaCircuit(), fields.BN254_FR)
    assert cs.nb_constraints < 400_000, cs.nb_constraints
