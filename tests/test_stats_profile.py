"""Constraint-count regression + profiler tests."""

import pathlib

from gnark_tpu import fields, profile, stats
from gnark_tpu.frontend import compile_circuit

DATA = pathlib.Path(__file__).parent / "data" / "stats.csv"


def test_stats_regression():
    """Fails on constraint-count drift; regenerate tests/data/stats.csv
    deliberately when a change is intended (reference stats_test.go)."""
    got = stats.to_csv(stats.collect())
    want = DATA.read_text()
    assert got == want, (
        "constraint counts drifted — if intended, regenerate with:\n"
        "python -c \"from gnark_tpu import stats; "
        "open('tests/data/stats.csv','w')"
        ".write(stats.to_csv(stats.collect()))\"")


def test_profiler():
    with profile.start() as p:
        compile_circuit(stats.SNIPPETS["hash/mimc"](), fields.BN254_FR)
    assert p.total > 300            # 110 rounds x 3 muls
    report = p.report()
    assert "total constraints" in report
    assert any("mimc" in loc for loc, _ in p.top_frames())
