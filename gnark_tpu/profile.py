"""Circuit profiling: which gadget costs how many constraints.

Analog of the reference's profile/ package (profile.go:120-166: each
added constraint records a sampled call stack so users can see
per-gadget constraint costs; collected asynchronously and exported in
pprof format). Here: a context-manager profiler that samples the
Python call stack at every constraint/instruction append and
aggregates counts per frame, with a pprof-like flat/cumulative text
report (the Go version's `go tool pprof -top` view).
"""

from __future__ import annotations

import collections
import contextlib
import traceback

_active: list["Profile"] = []


class Profile:
    def __init__(self, top: int = 20):
        self.top = top
        self.flat = collections.Counter()        # leaf frame -> count
        self.cum = collections.Counter()         # frame -> count
        self.stacks = collections.Counter()      # full stack -> count
        self.total = 0

    _PLUMBING = ("profile.py", "frontend/r1cs.py", "frontend/scs.py")

    def record(self, kind: str = "constraint") -> None:
        stack = [
            f"{f.name} ({f.filename.rsplit('/', 1)[-1]}:{f.lineno})"
            for f in traceback.extract_stack()
            if not f.filename.endswith(self._PLUMBING)
        ]
        self.total += 1
        if stack:
            self.flat[stack[-1]] += 1
            self.stacks[tuple(stack)] += 1
        for frame in set(stack):
            self.cum[frame] += 1

    def report(self) -> str:
        lines = [f"total constraints: {self.total}",
                 f"{'flat':>8} {'cum':>8}  location"]
        for loc, n in self.flat.most_common(self.top):
            lines.append(f"{n:>8} {self.cum[loc]:>8}  {loc}")
        return "\n".join(lines)

    def top_frames(self):
        return self.flat.most_common(self.top)


@contextlib.contextmanager
def start(top: int = 20):
    """with profile.start() as p: compile_circuit(...); print(p.report())"""
    p = Profile(top=top)
    _active.append(p)
    try:
        yield p
    finally:
        _active.remove(p)


def record_constraint() -> None:
    """Hook called by builders on each appended constraint
    (reference constraint/core.go:346,364 -> profile.RecordConstraint)."""
    for p in _active:
        p.record()


# -- pprof binary export (reference profile.go: "go tool pprof" files) -------

def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _ld(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _packed(field: int, values) -> bytes:
    body = b"".join(_varint(v) for v in values)
    return _ld(field, body)


def write_pprof(profile: "Profile", path: str) -> None:
    """Serialize a Profile as a gzipped pprof protobuf usable with
    `go tool pprof` / `pprof -top` (perftools.profiles.Profile)."""
    import gzip

    strings = [""]
    sidx = {"": 0}

    def s(x: str) -> int:
        if x not in sidx:
            sidx[x] = len(strings)
            strings.append(x)
        return sidx[x]

    func_ids = {}
    loc_ids = {}
    functions = []
    locations = []

    def loc(frame: str) -> int:
        if frame in loc_ids:
            return loc_ids[frame]
        fid = len(functions) + 1
        # frame format: "name (file:line)"
        name, _, rest = frame.partition(" (")
        fileline = rest.rstrip(")")
        fname, _, lineno = fileline.rpartition(":")
        try:
            line_no = int(lineno)
        except ValueError:
            line_no = 0
        functions.append(
            _ld(5, _tag(1, 0) + _varint(fid)
                + _tag(2, 0) + _varint(s(name))
                + _tag(4, 0) + _varint(s(fname))))
        lid = len(locations) + 1
        line_msg = _tag(1, 0) + _varint(fid) + _tag(2, 0) + _varint(line_no)
        locations.append(
            _ld(4, _tag(1, 0) + _varint(lid) + _ld(4, line_msg)))
        func_ids[frame] = fid
        loc_ids[frame] = lid
        return lid

    samples = []
    for stack, count in getattr(profile, "stacks",
                                {}).items() or []:
        ids = [loc(f) for f in reversed(stack)]   # leaf first
        samples.append(_ld(2, _packed(1, ids) + _packed(2, [count])))
    if not samples:
        # fall back to flat counts (leaf-only stacks)
        for frame, count in profile.flat.items():
            samples.append(
                _ld(2, _packed(1, [loc(frame)]) + _packed(2, [count])))

    vt = _ld(1, _tag(1, 0) + _varint(s("constraints"))
             + _tag(2, 0) + _varint(s("count")))
    body = vt + b"".join(samples) + b"".join(locations) \
        + b"".join(functions) \
        + b"".join(_ld(6, x.encode()) for x in strings)
    with gzip.open(path, "wb") as f:
        f.write(body)
