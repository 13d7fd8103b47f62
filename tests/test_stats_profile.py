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
        compile_circuit(stats.SNIPPETS["hash/mimc"][0](), fields.BN254_FR)
    assert p.total > 300            # 110 rounds x 3 muls
    report = p.report()
    assert "total constraints" in report
    assert any("mimc" in loc for loc, _ in p.top_frames())


def test_pprof_export(tmp_path):
    """write_pprof emits a well-formed gzipped protobuf (walked with a
    minimal decoder; sample/location/function/string sections all
    present and cross-consistent)."""
    import gzip
    from gnark_tpu import fields, profile
    from gnark_tpu.frontend import Circuit, Public, compile_circuit

    class C(Circuit):
        y: Public

        def define(self, api):
            acc = self.y
            for _ in range(5):
                acc = api.mul(acc, acc)
            api.assert_is_equal(api.is_zero(acc), 0)

    with profile.start() as p:
        compile_circuit(C(), fields.BN254_FR)
    out = tmp_path / "prof.pb.gz"
    profile.write_pprof(p, str(out))
    raw = gzip.open(out, "rb").read()

    # minimal protobuf walk
    def walk(buf):
        i = 0
        fields_seen = {}
        while i < len(buf):
            tag = 0
            shift = 0
            while True:
                b = buf[i]; i += 1
                tag |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            fno, wire = tag >> 3, tag & 7
            if wire == 2:
                ln = 0; shift = 0
                while True:
                    b = buf[i]; i += 1
                    ln |= (b & 0x7F) << shift
                    shift += 7
                    if not b & 0x80:
                        break
                payload = buf[i:i + ln]; i += ln
                fields_seen.setdefault(fno, []).append(payload)
            elif wire == 0:
                while buf[i] & 0x80:
                    i += 1
                i += 1
                fields_seen.setdefault(fno, []).append(None)
            else:
                raise AssertionError(f"unexpected wire type {wire}")
        return fields_seen

    top = walk(raw)
    assert 1 in top          # sample_type
    assert 2 in top          # samples
    assert 4 in top          # locations
    assert 5 in top          # functions
    assert 6 in top          # string table
    assert top[6][0] == b""  # first string must be empty
    assert len(top[4]) == len(top[5])   # one location per function here
    assert p.total > 0


def test_stats_gnark_comparison():
    """Pinned reference counts (internal/stats/latest_stats.csv
    bn254/groth16 rows) recorded beside ours; this asserts the
    comparison is produced and that directly-comparable API-level
    snippets stay within 2x of gnark (gadget-level economics like
    emulated mul are tracked in the CSV + COVERAGE, not gated)."""
    rows = stats.collect()
    comp = stats.gnark_comparison(rows)
    assert len(comp) >= 8
    by_name = {c[0]: c for c in comp}
    for name in ("api/is_zero", "hash/mimc", "api/lookup2",
                 "selector/mux4", "api/assert_is_crumb"):
        _, ours, ref, ratio = by_name[name]
        assert ratio <= 2.0, (name, ours, ref)


HEAVY_CSV = pathlib.Path(__file__).parent / "data" / "stats_heavy.csv"


def test_stats_heavy_regression():
    """Expensive-gadget constraint economics (slow tier): eddsa,
    emulated scalar-mul/ecdsa, sha256 block."""
    import pytest
    pytest.importorskip("jax")
    got = stats.to_csv(stats.collect(heavy=True))
    want = HEAVY_CSV.read_text()
    assert got == want, (
        "heavy constraint counts drifted — regenerate with:\n"
        "python -c \"from gnark_tpu import stats; "
        "open('tests/data/stats_heavy.csv','w')"
        ".write(stats.to_csv(stats.collect(heavy=True)))\"")


test_stats_heavy_regression = __import__("pytest").mark.slow(
    test_stats_heavy_regression)
