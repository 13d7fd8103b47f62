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
