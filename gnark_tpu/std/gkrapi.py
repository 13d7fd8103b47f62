"""GKR user API with in-circuit verification (reference std/gkrapi
api.go:25-69 + internal/gkr gkrcore).

Data-parallel GKR (Thaler): the SAME gate circuit evaluated on
N = 2^m instances. Wire values are multilinear extensions over the
instance hypercube; one sumcheck per gate layer over

    W_out~(r) = sum_x eq(r, x) * G(W_in1(x), ..., W_ind(x))

so no wiring MLEs are needed — the verifier evaluates eq and the gate
polynomial at the claimed child evaluations. Gates may be arbitrary
low-degree polynomials (registry below; reference
constraint/solver/gkrgates).

Flow (mirrors gkrapi.New -> Import -> ops -> Solve -> Export -> Verify):

    g = GkrApi(api, n_instances)
    x = g.import_input([...vars...])       # one var per instance
    h = g.named_gate("pow7", g.add(x, k))  # build the per-instance fn
    outs = g.solve(h)                      # hint-computed outputs
    g.verify()                             # in-circuit GKR verifier

Cost model: the in-circuit verifier pays O(depth * m * deg) for the
sumchecks + O(N) per input/output MLE evaluation, versus O(N * cost(f))
for direct evaluation — the win grows with gate cost (MiMC/Poseidon2).
The Fiat-Shamir seed comes from api.commit over all instance values
(constant cost; reference uses the same commit-based initial
challenge).

Topology: general DAGs — intermediate wires may fan out to multiple
consumers; per-wire claims from different consumers are aggregated
with a rho-weighted random linear combination before each layer's
sumcheck (see _prove_layer / the rho-aggregation below).
"""

from __future__ import annotations

import dataclasses

from gnark_tpu.constraint.hints import register_hint
from gnark_tpu.std.hash.mimc import MiMC, MiMCGadget


# -- gate registry -----------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Gate:
    name: str
    nb_in: int
    degree: int
    ev: object          # ev(q, *args) -> int  (host, mod q)


def _pow_ev(n):
    def ev(q, a):
        return pow(a, n, q)
    return ev


GATES = {
    "add": Gate("add", 2, 1, lambda q, a, b: (a + b) % q),
    "sub": Gate("sub", 2, 1, lambda q, a, b: (a - b) % q),
    "mul": Gate("mul", 2, 2, lambda q, a, b: a * b % q),
    "neg": Gate("neg", 1, 1, lambda q, a: (-a) % q),
    "sqr": Gate("sqr", 1, 2, lambda q, a: a * a % q),
    "pow5": Gate("pow5", 1, 5, _pow_ev(5)),
    "pow7": Gate("pow7", 1, 7, _pow_ev(7)),
    "pow17": Gate("pow17", 1, 17, _pow_ev(17)),
}


def register_gate(name: str, nb_in: int, degree: int, ev) -> None:
    """Add a custom gate (reference gkrgates.Register)."""
    GATES[name] = Gate(name, nb_in, degree, ev)


def _gate_eval_circuit(api, gate: Gate, args):
    """Evaluate a gate polynomial on circuit variables."""
    if gate.name == "add":
        return api.add(args[0], args[1])
    if gate.name == "sub":
        return api.sub(args[0], args[1])
    if gate.name == "mul":
        return api.mul(args[0], args[1])
    if gate.name == "neg":
        return api.neg(args[0])
    if gate.name == "sqr":
        return api.mul(args[0], args[0])
    if gate.name.startswith("pow"):
        n = int(gate.name[3:])
        r = args[0]
        acc = 1
        base = r
        e = n
        while e:
            if e & 1:
                acc = api.mul(acc, base) if acc != 1 else base
            e >>= 1
            if e:
                base = api.mul(base, base)
        return acc
    if gate.name.startswith("mimc_"):
        return _mimc_gate_circuit(api, gate.name, args)
    if gate.name.startswith("p2_"):
        return _p2_gate_circuit(api, gate.name, args)
    raise KeyError(f"no circuit evaluation for gate {gate.name!r}")


# -- MLE helpers (host) ------------------------------------------------------

def _fold(q, table, t):
    half = len(table) // 2
    return [(table[i] + t * (table[half + i] - table[i])) % q
            for i in range(half)]


def _mle_eval(q, table, point):
    t = list(table)
    for r in point:
        t = _fold(q, t, r)
    return t[0]


def _eq_table(q, r):
    """Dense table of eq(r, x) over x in {0,1}^m (x_0 = MSB)."""
    t = [1]
    for rj in r:
        t = [v * w % q for v in t for w in ((1 - rj) % q, rj)]
    return t


# -- host prover/verifier ----------------------------------------------------

def _prove(q, wires, inputs_vals, out_wire, seed, field_name):
    """wires: list of (gate_name|None, in_ids); inputs_vals: values for
    input wires; returns the flat proof list (what travels through the
    hint).

    General DAG topology: each wire may feed many consumers; claims on
    the same wire at different points are AGGREGATED with powers of a
    transcript challenge rho into one sumcheck (the reference
    gkrcore claimsManager)."""
    n = len(next(iter(inputs_vals.values())))
    m = max(1, (n - 1).bit_length())
    assert n == 1 << m
    vals = dict(inputs_vals)

    def ev(w):
        if w in vals:
            return vals[w]
        g, ins = wires[w]
        gate = GATES[g]
        cols = [ev(i) for i in ins]
        vals[w] = [gate.ev(q, *[c[i] for c in cols]) for i in range(n)]
        return vals[w]

    ev(out_wire)
    ts = MiMC(field_name)
    ts.write(seed)
    r = []
    for i in range(m):
        ts.write(i)
        r.append(ts.sum())

    flat = []
    claims = {w: [] for w in range(len(wires))}
    claims[out_wire].append((r, _mle_eval(q, vals[out_wire], r)))

    for w in range(len(wires) - 1, -1, -1):
        cl = claims[w]
        if not cl:
            continue
        g, ins = wires[w]
        if g is None:
            continue                    # input claims: checked directly
        gate = GATES[g]
        D = 1 + gate.degree
        if len(cl) > 1:
            ts.write(len(cl))
            rho = ts.sum()
        else:
            rho = 1
        eq_t = [0] * n
        rp = 1
        for (pt, _v) in cl:
            et = _eq_table(q, pt)
            for i in range(n):
                eq_t[i] = (eq_t[i] + rp * et[i]) % q
            rp = rp * rho % q

        def combine(row):
            return row[0] * gate.ev(q, *row[1:]) % q

        chals = []
        cur_tabs = [eq_t] + [list(vals[i]) for i in ins]
        for _ in range(m):
            evals = []
            for t in range(D + 1):
                ft = [_fold(q, tb, t) for tb in cur_tabs]
                sm = 0
                for i in range(len(ft[0])):
                    sm = (sm + combine([tb[i] for tb in ft])) % q
                evals.append(sm)
            flat.extend(evals)
            ts.write(*evals)
            rc = ts.sum()
            chals.append(rc)
            cur_tabs = [_fold(q, tb, rc) for tb in cur_tabs]
        finals = [tb[0] for tb in cur_tabs[1:]]
        flat.extend(finals)
        ts.write(*finals)
        for child, fv in zip(ins, finals):
            claims[child].append((chals, fv))

    return flat


def _proof_size(wires, out_wire, m: int) -> int:
    """Static proof length (elements) for the claim-aggregated walk."""
    ncl = [0] * len(wires)
    ncl[out_wire] += 1
    total = 0
    for w in range(len(wires) - 1, -1, -1):
        if ncl[w] == 0:
            continue
        g, ins = wires[w]
        if g is None:
            continue
        gate = GATES[g]
        total += m * (gate.degree + 2) + gate.nb_in
        for c in ins:
            ncl[c] += 1
    return total


# -- hints -------------------------------------------------------------------

_SPECS = {}          # spec_id -> (wires, out_wire, field_name)


def _spec_register(wires, out_wire, field_name):
    import hashlib
    key = repr((tuple((g, tuple(i)) for g, i in wires), out_wire,
                field_name)).encode()
    sid = int.from_bytes(hashlib.sha256(key).digest()[:4], "big") \
        % (1 << 30)
    _SPECS[sid] = (wires, out_wire, field_name)
    return sid


@register_hint("gkr_solve")
def _gkr_solve(q, inputs):
    """[spec_id, n, n_inputs, input cols...] -> output column."""
    sid, n, n_in = inputs[0], inputs[1], inputs[2]
    wires, out_wire, _ = _SPECS[sid]
    cols = {}
    off = 3
    in_ids = [w for w, (g, _) in enumerate(wires) if g is None]
    for w in in_ids:
        cols[w] = inputs[off:off + n]
        off += n

    vals = dict(cols)

    def ev(w):
        if w in vals:
            return vals[w]
        g, ins = wires[w]
        gate = GATES[g]
        cs = [ev(i) for i in ins]
        vals[w] = [gate.ev(q, *[c[i] for c in cs]) for i in range(n)]
        return vals[w]

    return list(ev(out_wire))


@register_hint("gkr_prove")
def _gkr_prove(q, inputs):
    """[spec_id, n, seed, input cols...] -> flat proof elements."""
    sid, n, seed = inputs[0], inputs[1], inputs[2]
    wires, out_wire, field_name = _SPECS[sid]
    cols = {}
    off = 3
    in_ids = [w for w, (g, _) in enumerate(wires) if g is None]
    for w in in_ids:
        cols[w] = inputs[off:off + n]
        off += n
    return _prove(q, wires, cols, out_wire, seed, field_name)


# -- the user-facing API -----------------------------------------------------

class GkrApi:
    def __init__(self, api, n_instances: int, field_name: str = None):
        assert n_instances & (n_instances - 1) == 0, \
            "instance count must be a power of two"
        self.api = api
        self.n = n_instances
        self.m = (n_instances - 1).bit_length()
        from gnark_tpu import fields
        self.field_name = field_name or \
            next(name for name, f in fields.FIELDS.items()
                 if f.modulus == api.field())
        self.wires = []          # (gate_name|None, in_ids)
        self.in_cols = {}        # wire -> list of circuit vars
        self._out = None
        self._out_col = None

    # -- build ---------------------------------------------------------------

    def import_input(self, vars_) -> int:
        assert len(vars_) == self.n
        self.wires.append((None, ()))
        w = len(self.wires) - 1
        self.in_cols[w] = list(vars_)
        return w

    def named_gate(self, name: str, *ins) -> int:
        g = GATES[name]
        assert len(ins) == g.nb_in
        self.wires.append((name, tuple(ins)))
        return len(self.wires) - 1

    def add(self, a, b) -> int:
        return self.named_gate("add", a, b)

    def sub(self, a, b) -> int:
        return self.named_gate("sub", a, b)

    def mul(self, a, b) -> int:
        return self.named_gate("mul", a, b)

    # -- solve + verify ------------------------------------------------------

    def solve(self, out_wire: int):
        """Hint-evaluate the batched circuit; returns the N output
        variables (reference gkrapi Solve/Export)."""
        api = self.api
        sid = _spec_register(list(self.wires), out_wire, self.field_name)
        flat_in = []
        for w in sorted(self.in_cols):
            flat_in.extend(self.in_cols[w])
        outs = api.new_hint("gkr_solve", self.n, sid, self.n,
                            len(self.in_cols), *flat_in)
        self._out = out_wire
        self._out_col = outs
        return outs

    def verify(self) -> None:
        """Append the in-circuit GKR verification constraints
        (reference gkrapi verification via the gkr verifier gadget) —
        general DAG topology with rho-aggregated claims."""
        api = self.api
        q = api.field()
        assert self._out is not None, "call solve() first"
        out_wire = self._out
        sid = _spec_register(list(self.wires), out_wire, self.field_name)

        flat_in = []
        for w in sorted(self.in_cols):
            flat_in.extend(self.in_cols[w])
        # Fiat-Shamir seed binds every instance value via one commitment
        seed = api.commit(*(flat_in + list(self._out_col)))

        total = _proof_size(self.wires, out_wire, self.m)
        proof = api.new_hint("gkr_prove", total, sid, self.n, seed,
                             *flat_in)

        ts = MiMCGadget(api, self.field_name)
        ts.write(seed)
        r = []
        for i in range(self.m):
            ts.write(i)
            r.append(ts.sum())

        claims = {w: [] for w in range(len(self.wires))}
        claims[out_wire].append(
            (r, self._mle_eval_circuit(list(self._out_col), r)))
        pos = 0

        def eq_eval(rp, rho_pt):
            acc = 1
            for a, b in zip(rp, rho_pt):
                term = api.add(api.mul(a, b),
                               api.mul(api.sub(1, a), api.sub(1, b)))
                acc = api.mul(acc, term)
            return acc

        for w in range(len(self.wires) - 1, -1, -1):
            cl = claims[w]
            if not cl:
                continue
            g, ins = self.wires[w]
            if g is None:
                # input wire: check every claim against the input MLE
                for (pt, val) in cl:
                    want = self._mle_eval_circuit(self.in_cols[w], pt)
                    api.assert_is_equal(val, want)
                continue
            gate = GATES[g]
            D = 1 + gate.degree
            if len(cl) > 1:
                ts.write(len(cl))
                rho = ts.sum()
            else:
                rho = 1
            # aggregated claim value: sum rho^j * v_j
            cur = 0
            rp = 1
            for (_pt, v) in cl:
                cur = api.add(cur, api.mul(rp, v))
                rp = api.mul(rp, rho) if not isinstance(rho, int) \
                    else rp * rho % q
            chals = []
            for _ in range(self.m):
                evals = proof[pos:pos + D + 1]
                pos += D + 1
                api.assert_is_equal(api.add(evals[0], evals[1]), cur)
                ts.write(*evals)
                rc = ts.sum()
                chals.append(rc)
                cur = self._interp_circuit(evals, rc)
            finals = proof[pos:pos + gate.nb_in]
            pos += gate.nb_in
            ts.write(*finals)
            gv = _gate_eval_circuit(api, gate, finals)
            eq_total = 0
            rp = 1
            for (pt, _v) in cl:
                eq_total = api.add(eq_total,
                                   api.mul(rp, eq_eval(pt, chals)))
                rp = api.mul(rp, rho) if not isinstance(rho, int) \
                    else rp * rho % q
            api.assert_is_equal(cur, api.mul(eq_total, gv))
            for child, fv in zip(ins, finals):
                claims[child].append((chals, fv))

    # -- circuit MLE helpers --------------------------------------------------

    def _mle_eval_circuit(self, col, point):
        api = self.api
        t = list(col)
        for rp in point:
            half = len(t) // 2
            t = [api.add(t[i], api.mul(rp, api.sub(t[half + i], t[i])))
                 for i in range(half)]
        return t[0]

    def _interp_circuit(self, evals, rc):
        """Evaluate the univariate through (i, evals[i]) at rc
        (variable) — Lagrange with constant denominators."""
        api = self.api
        q = api.field()
        n = len(evals)
        # prefix/suffix products of (rc - j)
        diffs = [api.sub(rc, j) for j in range(n)]
        pre = [1] * (n + 1)
        for i in range(n):
            pre[i + 1] = api.mul(pre[i], diffs[i]) if i else diffs[0]
        suf = [1] * (n + 1)
        for i in range(n - 1, -1, -1):
            suf[i] = api.mul(suf[i + 1], diffs[i]) \
                if i < n - 1 else diffs[i]
        out = 0
        for i in range(n):
            num_l = pre[i] if i else 1
            num_r = suf[i + 1] if i < n - 1 else 1
            num = api.mul(num_l, num_r)
            den = 1
            for j in range(n):
                if j != i:
                    den = den * ((i - j) % q) % q
            out = api.add(out, api.mul(num, evals[i] if den == 1 else
                                       api.mul(evals[i],
                                               pow(den, -1, q))))
        return out


# -- GKR-accelerated MiMC (reference std/hash/mimc GKR variant) --------------

def gkr_mimc_one_block(g: GkrApi, x_wire: int,
                       field_name: str = "bn254_fr") -> int:
    """Wire chain computing mimc_hash([x]) per instance (one-block
    Miyaguchi-Preneel with zero initial state: E(x, 0) + x). The
    verifier cost is O(rounds * log N) sumcheck work instead of
    O(rounds * N) field muls — the reference's gkr-mimc speedup."""
    from gnark_tpu.std.hash.mimc import PARAMS, round_constants
    consts = round_constants(field_name)
    _, e = PARAMS[field_name]
    w = x_wire
    for i, c in enumerate(consts):
        name = f"mimc_{field_name}_r{i}"
        if name not in GATES:
            def _ev(q, a, _c=c, _e=e):
                return pow((a + _c) % q, _e, q)
            register_gate(name, 1, e, _ev)
        w = g.named_gate(name, w)
    return g.add(w, x_wire)


def _mimc_gate_circuit(api, name, args):
    """Circuit evaluation for the registered mimc round gates."""
    field_name, ri = name[5:].rsplit("_r", 1)
    from gnark_tpu.std.hash.mimc import PARAMS, round_constants
    c = round_constants(field_name)[int(ri)]
    _, e = PARAMS[field_name]
    x = api.add(args[0], c)
    x2 = api.mul(x, x)
    x4 = api.mul(x2, x2)
    if e == 5:
        return api.mul(x4, x)
    if e == 7:
        return api.mul(api.mul(x4, x2), x)
    if e == 17:
        x8 = api.mul(x4, x4)
        return api.mul(api.mul(x8, x8), x)
    raise ValueError(f"unsupported mimc exponent {e}")


# -- constant wires -----------------------------------------------------------

def _gkr_constant(g: "GkrApi", v: int) -> int:
    """Input wire with a constant column (free at the circuit level:
    the values are literals)."""
    return g.import_input([v % g.api.field()] * g.n)


GkrApi.constant = _gkr_constant


# -- GKR-accelerated Poseidon2 (reference gkr-poseidon2) ----------------------

def _register_poseidon2_gates(field_name: str):
    from gnark_tpu.std.hash.poseidon2 import _split_constants
    ext1, internal, ext2 = _split_constants(field_name)

    def sbox(q, x):
        x2 = x * x % q
        return x2 * x2 % q * x % q

    def reg(name, nb_in, deg, ev):
        if name not in GATES:
            register_gate(name, nb_in, deg, ev)

    # pre-mixing: out_k = s_k + sum(s)
    for k in range(3):
        reg(f"p2_{field_name}_pre_{k}", 3, 1,
            (lambda q, a, b, c, _k=k: ((a, b, c)[_k] + a + b + c) % q))
    # external rounds: out_k = t_k + sum(t), t_j = sbox(s_j + c_j)
    for phase, rounds in (("e1", ext1), ("e2", ext2)):
        for r, rc in enumerate(rounds):
            for k in range(3):
                def ev(q, a, b, c, _rc=tuple(rc), _k=k):
                    t = [sbox(q, (x + cc) % q)
                         for x, cc in zip((a, b, c), _rc)]
                    return (t[_k] + sum(t)) % q
                reg(f"p2_{field_name}_{phase}{r}_{k}", 3, 5, ev)
    # internal rounds: t0 = sbox(s0 + c); M_I = [[2,1,1],[1,2,1],[1,1,3]]
    for r, c in enumerate(internal):
        def ev0(q, a, b, cc, _c=c):
            t0 = sbox(q, (a + _c) % q)
            return (2 * t0 + b + cc) % q
        def ev1(q, a, b, cc, _c=c):
            t0 = sbox(q, (a + _c) % q)
            return (t0 + 2 * b + cc) % q
        def ev2(q, a, b, cc, _c=c):
            t0 = sbox(q, (a + _c) % q)
            return (t0 + b + 3 * cc) % q
        reg(f"p2_{field_name}_i{r}_0", 3, 5, ev0)
        reg(f"p2_{field_name}_i{r}_1", 3, 5, ev1)
        reg(f"p2_{field_name}_i{r}_2", 3, 5, ev2)


def _p2_gate_circuit(api, name, args):
    """Circuit evaluation of the registered poseidon2 round gates."""
    from gnark_tpu.std.hash.poseidon2 import _split_constants
    rest = name[3:]
    field_name, tag = rest.rsplit("_", 2)[0], rest.split("_")[-2:]
    kind_r, k = tag[0], int(tag[1])
    ext1, internal, ext2 = _split_constants(field_name)

    def sbox(x):
        x2 = api.mul(x, x)
        x4 = api.mul(x2, x2)
        return api.mul(x4, x)

    a, b, c = args
    if kind_r == "pre":
        tot = api.add(a, b, c)
        return api.add((a, b, c)[k], tot)
    if kind_r.startswith("e"):
        rounds = ext1 if kind_r[1] == "1" else ext2
        rc = rounds[int(kind_r[2:])]
        t = [sbox(api.add(x, cc)) for x, cc in zip((a, b, c), rc)]
        return api.add(t[k], api.add(t[0], t[1], t[2]))
    if kind_r.startswith("i"):
        cc = internal[int(kind_r[1:])]
        t0 = sbox(api.add(a, cc))
        if k == 0:
            return api.add(api.mul(2, t0), b, c)
        if k == 1:
            return api.add(t0, api.mul(2, b), c)
        return api.add(t0, b, api.mul(3, c))
    raise KeyError(name)


def gkr_poseidon2_permute(g: "GkrApi", s0: int, s1: int, s2: int,
                          field_name: str = "bn254_fr"):
    """Poseidon2 permutation as GKR wires: N permutations verified with
    O(rounds * log N) sumcheck work (reference gkr-poseidon2)."""
    from gnark_tpu.std.hash.poseidon2 import _split_constants
    _register_poseidon2_gates(field_name)
    ext1, internal, ext2 = _split_constants(field_name)
    st = (s0, s1, s2)
    st = tuple(g.named_gate(f"p2_{field_name}_pre_{k}", *st)
               for k in range(3))
    for r in range(len(ext1)):
        st = tuple(g.named_gate(f"p2_{field_name}_e1{r}_{k}", *st)
                   for k in range(3))
    for r in range(len(internal)):
        st = tuple(g.named_gate(f"p2_{field_name}_i{r}_{k}", *st)
                   for k in range(3))
    for r in range(len(ext2)):
        st = tuple(g.named_gate(f"p2_{field_name}_e2{r}_{k}", *st)
                   for k in range(3))
    return st


def gkr_poseidon2_hash2(g: "GkrApi", a: int, b: int,
                        field_name: str = "bn254_fr") -> int:
    """hash of two elements per instance (one sponge block, rate 2)."""
    zero = g.constant(0)
    out = gkr_poseidon2_permute(g, a, b, zero, field_name)
    return out[0]
