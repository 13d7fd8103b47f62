// Native witness solver: 4x64-limb Montgomery arithmetic + leveled
// instruction interpreter.
//
// This is the TPU build's analog of the reference's per-field generated
// solver (constraint/bn254/solver.go, backed by gnark-crypto's field
// assembly): witness solving is the irregular, host-bound part of
// proving (SURVEY.md §2.4 P1 / §7 step 5), so it runs as native code
// with Python only orchestrating and providing hint callbacks.
//
// C ABI, driven from Python via ctypes (no pybind11 in the image).
// Field-generic for moduli up to 255 bits (4x64 limbs).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <cstdio>
#include <thread>
#include <vector>

typedef unsigned __int128 u128;
typedef uint64_t u64;
typedef uint32_t u32;

struct Field {
    u64 p[4];      // modulus, little-endian limbs
    u64 r2[4];     // R^2 mod p (for to_mont)
    u64 n0inv;     // -p^-1 mod 2^64
};

struct Fe { u64 v[4]; };

static inline bool is_zero(const Fe &a) {
    return (a.v[0] | a.v[1] | a.v[2] | a.v[3]) == 0;
}

static inline bool geq_p(const Fe &a, const Field &F) {
    for (int i = 3; i >= 0; i--) {
        if (a.v[i] > F.p[i]) return true;
        if (a.v[i] < F.p[i]) return false;
    }
    return true;  // equal
}

static inline void sub_p(Fe &a, const Field &F) {
    u128 borrow = 0;
    for (int i = 0; i < 4; i++) {
        u128 d = (u128)a.v[i] - F.p[i] - (u64)borrow;
        a.v[i] = (u64)d;
        borrow = (d >> 64) ? 1 : 0;
    }
}

static inline void fe_add(const Fe &a, const Fe &b, Fe &r, const Field &F) {
    u128 carry = 0;
    for (int i = 0; i < 4; i++) {
        u128 s = (u128)a.v[i] + b.v[i] + (u64)carry;
        r.v[i] = (u64)s;
        carry = s >> 64;
    }
    if (carry || geq_p(r, F)) sub_p(r, F);
}

static inline void fe_sub(const Fe &a, const Fe &b, Fe &r, const Field &F) {
    u128 borrow = 0;
    for (int i = 0; i < 4; i++) {
        u128 d = (u128)a.v[i] - b.v[i] - (u64)borrow;
        r.v[i] = (u64)d;
        borrow = (d >> 64) ? 1 : 0;
    }
    if (borrow) {  // add p back
        u128 carry = 0;
        for (int i = 0; i < 4; i++) {
            u128 s = (u128)r.v[i] + F.p[i] + (u64)carry;
            r.v[i] = (u64)s;
            carry = s >> 64;
        }
    }
}

static void fe_mul(const Fe &x, const Fe &y, Fe &out, const Field &F) {
    u64 t[6] = {0, 0, 0, 0, 0, 0};
    for (int i = 0; i < 4; i++) {
        u128 carry = 0;
        for (int j = 0; j < 4; j++) {
            u128 cur = (u128)x.v[i] * y.v[j] + t[j] + (u64)carry;
            t[j] = (u64)cur;
            carry = cur >> 64;
        }
        u128 s = (u128)t[4] + (u64)carry;
        t[4] = (u64)s;
        t[5] = (u64)(s >> 64);

        u64 m = t[0] * F.n0inv;
        u128 cur = (u128)m * F.p[0] + t[0];
        carry = cur >> 64;
        for (int j = 1; j < 4; j++) {
            cur = (u128)m * F.p[j] + t[j] + (u64)carry;
            t[j - 1] = (u64)cur;
            carry = cur >> 64;
        }
        s = (u128)t[4] + (u64)carry;
        t[3] = (u64)s;
        t[4] = t[5] + (u64)(s >> 64);
        t[5] = 0;
    }
    Fe r;
    memcpy(r.v, t, 32);
    if (t[4] || geq_p(r, F)) sub_p(r, F);
    out = r;
}

static void fe_to_mont(const Fe &a, Fe &r, const Field &F) {
    Fe r2; memcpy(r2.v, F.r2, 32);
    fe_mul(a, r2, r, F);
}

static void fe_from_mont(const Fe &a, Fe &r, const Field &F) {
    Fe one = {{1, 0, 0, 0}};
    fe_mul(a, one, r, F);
}

// a^(p-2) — Montgomery-domain Fermat inverse; inv(0) = 0
static void fe_inv(const Fe &a, Fe &r, const Field &F) {
    // exponent p-2
    u64 e[4];
    memcpy(e, F.p, 32);
    // subtract 2
    u128 borrow = 2;
    for (int i = 0; i < 4 && borrow; i++) {
        u128 d = (u128)e[i] - (u64)borrow;
        e[i] = (u64)d;
        borrow = (d >> 64) ? 1 : 0;
    }
    Fe one_raw = {{1, 0, 0, 0}};
    Fe result;
    fe_to_mont(one_raw, result, F);
    Fe base = a;
    for (int limb = 0; limb < 4; limb++) {
        u64 bits = e[limb];
        for (int b = 0; b < 64; b++) {
            if (bits & 1) fe_mul(result, base, result, F);
            fe_mul(base, base, base, F);
            bits >>= 1;
        }
    }
    r = result;
}

// ---------------------------------------------------------------------------
// constraint-system layout (see gnark_tpu/native/__init__.py marshaling)
// ---------------------------------------------------------------------------

enum Kind { K_R1C = 0, K_ASSERT = 1, K_HINT = 2, K_SCS = 3, K_LOG = 4 };

typedef int (*hint_cb_t)(int32_t inst_id, const u64 *inputs, int32_t n_in,
                         u64 *outputs, int32_t n_out);

struct CS {
    Field F;
    std::vector<Fe> consts;       // Montgomery form
    std::vector<Fe> consts_inv;   // precomputed inverses (0 for 0)
    // linexp term stream: (const_idx, wire)
    const u32 *terms;
    // r1cs: per constraint 6 offsets into terms (l0,l1,r0,r1,o0,o1)
    const u32 *r1c_off;
    // scs: per constraint xa,xb,xo + 5 const idx (qL,qR,qO,qM,qC)
    const u32 *scs_data;
    // instructions: kind, cidx, out0, out1, hin0, hin1
    const int64_t *inst;
    int64_t n_inst;
    const u32 *outputs;           // flat output wire ids
    // hint inputs: flat linexp offsets (start,end) pairs into terms
    const u32 *hint_in_off;
    hint_cb_t hint_cb;
};

struct SolveState {
    std::vector<Fe> values;       // Montgomery
    std::vector<uint8_t> solved;
    std::vector<Fe> a, b, c;      // r1cs evaluation vectors
    char err[256];
};

// evaluate linexp terms[s..e): returns (sum of known, count unknown,
// last unknown term index)
static int eval_linexp(const CS &cs, SolveState &st, u32 s, u32 e,
                       Fe &acc, u32 &unk_term) {
    int unknown = 0;
    acc = Fe{{0, 0, 0, 0}};
    for (u32 i = s; i < e; i++) {
        u32 cidx = cs.terms[2 * i];
        u32 wire = cs.terms[2 * i + 1];
        if (!st.solved[wire]) {
            unknown++;
            unk_term = i;
            continue;
        }
        Fe t;
        fe_mul(cs.consts[cidx], st.values[wire], t, cs.F);
        fe_add(acc, t, acc, cs.F);
    }
    return unknown;
}

static bool solve_r1c(const CS &cs, SolveState &st, int64_t cidx,
                      bool is_assert) {
    const u32 *off = cs.r1c_off + 6 * cidx;
    Fe la, ra, oa;
    u32 lu = 0, ru = 0, ou = 0;
    int nl = eval_linexp(cs, st, off[0], off[1], la, lu);
    int nr = eval_linexp(cs, st, off[2], off[3], ra, ru);
    int no = eval_linexp(cs, st, off[4], off[5], oa, ou);
    Fe tmp;

    if (nl == 0 && nr == 0 && no == 0) {
        fe_mul(la, ra, tmp, cs.F);
        if (memcmp(tmp.v, oa.v, 32) != 0) {
            snprintf(st.err, sizeof(st.err),
                     "constraint #%lld not satisfied", (long long)cidx);
            return false;
        }
    } else if (nl == 1 && nr == 0 && no == 0) {
        u32 w = cs.terms[2 * lu + 1];
        Fe coeff = cs.consts[cs.terms[2 * lu]];
        const Fe &ci = cs.consts_inv[cs.terms[2 * lu]];
        if (is_zero(ra)) {
            if (!is_zero(oa)) {
                snprintf(st.err, sizeof(st.err), "0*x != o at #%lld",
                         (long long)cidx);
                return false;
            }
            st.values[w] = Fe{{0, 0, 0, 0}};
        } else {
            Fe ri, t2;
            fe_inv(ra, ri, cs.F);
            fe_mul(oa, ri, t2, cs.F);
            fe_sub(t2, la, t2, cs.F);
            fe_mul(t2, ci, st.values[w], cs.F);
        }
        st.solved[w] = 1;
        fe_mul(coeff, st.values[w], tmp, cs.F);
        fe_add(la, tmp, la, cs.F);
    } else if (nr == 1 && nl == 0 && no == 0) {
        u32 w = cs.terms[2 * ru + 1];
        Fe coeff = cs.consts[cs.terms[2 * ru]];
        const Fe &ci = cs.consts_inv[cs.terms[2 * ru]];
        if (is_zero(la)) {
            if (!is_zero(oa)) {
                snprintf(st.err, sizeof(st.err), "x*0 != o at #%lld",
                         (long long)cidx);
                return false;
            }
            st.values[w] = Fe{{0, 0, 0, 0}};
        } else {
            Fe li, t2;
            fe_inv(la, li, cs.F);
            fe_mul(oa, li, t2, cs.F);
            fe_sub(t2, ra, t2, cs.F);
            fe_mul(t2, ci, st.values[w], cs.F);
        }
        st.solved[w] = 1;
        fe_mul(coeff, st.values[w], tmp, cs.F);
        fe_add(ra, tmp, ra, cs.F);
    } else if (no == 1 && nl == 0 && nr == 0) {
        u32 w = cs.terms[2 * ou + 1];
        Fe coeff = cs.consts[cs.terms[2 * ou]];
        const Fe &ci = cs.consts_inv[cs.terms[2 * ou]];
        Fe lr, t2;
        fe_mul(la, ra, lr, cs.F);
        fe_sub(lr, oa, t2, cs.F);
        fe_mul(t2, ci, st.values[w], cs.F);
        st.solved[w] = 1;
        fe_mul(coeff, st.values[w], tmp, cs.F);
        fe_add(oa, tmp, oa, cs.F);
    } else {
        snprintf(st.err, sizeof(st.err),
                 "cannot solve constraint #%lld (%d,%d,%d unknowns)",
                 (long long)cidx, nl, nr, no);
        return false;
    }
    st.a[cidx] = la;
    st.b[cidx] = ra;
    st.c[cidx] = oa;
    return true;
}

static bool solve_scs(const CS &cs, SolveState &st, int64_t cidx) {
    const u32 *d = cs.scs_data + 8 * cidx;
    u32 xa = d[0], xb = d[1], xo = d[2];
    const Fe &qL = cs.consts[d[3]];
    const Fe &qR = cs.consts[d[4]];
    const Fe &qO = cs.consts[d[5]];
    const Fe &qM = cs.consts[d[6]];
    const Fe &qC = cs.consts[d[7]];
    Fe t1, t2, num;

    bool sa = st.solved[xa], sb = st.solved[xb], so = st.solved[xo];
    if (sa && sb && !so) {
        // xo = -(qL a + qR b + qM ab + qC)/qO
        fe_mul(qL, st.values[xa], num, cs.F);
        fe_mul(qR, st.values[xb], t1, cs.F);
        fe_add(num, t1, num, cs.F);
        fe_mul(st.values[xa], st.values[xb], t1, cs.F);
        fe_mul(qM, t1, t1, cs.F);
        fe_add(num, t1, num, cs.F);
        fe_add(num, qC, num, cs.F);
        if (is_zero(qO)) {
            snprintf(st.err, sizeof(st.err), "scs #%lld: qO == 0",
                     (long long)cidx);
            return false;
        }
        Fe zero = {{0, 0, 0, 0}};
        const Fe &qi = cs.consts_inv[d[5]];
        fe_mul(num, qi, t1, cs.F);
        fe_sub(zero, t1, st.values[xo], cs.F);
        st.solved[xo] = 1;
        return true;
    }
    if (sa && sb && so) {
        fe_mul(qL, st.values[xa], num, cs.F);
        fe_mul(qR, st.values[xb], t1, cs.F);
        fe_add(num, t1, num, cs.F);
        fe_mul(st.values[xa], st.values[xb], t1, cs.F);
        fe_mul(qM, t1, t1, cs.F);
        fe_add(num, t1, num, cs.F);
        fe_mul(qO, st.values[xo], t1, cs.F);
        fe_add(num, t1, num, cs.F);
        fe_add(num, qC, num, cs.F);
        if (!is_zero(num)) {
            snprintf(st.err, sizeof(st.err),
                     "sparse constraint #%lld not satisfied",
                     (long long)cidx);
            return false;
        }
        return true;
    }
    // solve xa or xb (rare; mirror python solver)
    if (!sa && sb && so) {
        fe_mul(qM, st.values[xb], t1, cs.F);
        fe_add(qL, t1, t1, cs.F);          // den
        fe_mul(qR, st.values[xb], num, cs.F);
        fe_mul(qO, st.values[xo], t2, cs.F);
        fe_add(num, t2, num, cs.F);
        fe_add(num, qC, num, cs.F);
        if (is_zero(t1)) {
            snprintf(st.err, sizeof(st.err), "scs #%lld singular",
                     (long long)cidx);
            return false;
        }
        Fe ti, zero = {{0, 0, 0, 0}};
        fe_inv(t1, ti, cs.F);
        fe_mul(num, ti, t2, cs.F);
        fe_sub(zero, t2, st.values[xa], cs.F);
        st.solved[xa] = 1;
        return true;
    }
    if (!sb && sa && so) {
        fe_mul(qM, st.values[xa], t1, cs.F);
        fe_add(qR, t1, t1, cs.F);
        fe_mul(qL, st.values[xa], num, cs.F);
        fe_mul(qO, st.values[xo], t2, cs.F);
        fe_add(num, t2, num, cs.F);
        fe_add(num, qC, num, cs.F);
        if (is_zero(t1)) {
            snprintf(st.err, sizeof(st.err), "scs #%lld singular",
                     (long long)cidx);
            return false;
        }
        Fe ti, zero = {{0, 0, 0, 0}};
        fe_inv(t1, ti, cs.F);
        fe_mul(num, ti, t2, cs.F);
        fe_sub(zero, t2, st.values[xb], cs.F);
        st.solved[xb] = 1;
        return true;
    }
    snprintf(st.err, sizeof(st.err), "scs #%lld: multiple unknowns",
             (long long)cidx);
    return false;
}

extern "C" {

// returns 0 on success; on failure, err_out gets the message.
// values_io: (n_wires x 4) u64 raw little-endian; input wires pre-set
// with solved_io[i] = 1. On success all wires filled (raw form) and
// abc_out (3 x n_r1c x 4) holds the r1cs evaluation vectors.
int gnark_tpu_solve(
    const u64 *p_le, const u64 *r2_le, u64 n0inv,
    const u64 *consts_raw, int64_t n_consts,
    const u32 *terms, int64_t n_terms,
    const u32 *r1c_off, int64_t n_r1c,
    const u32 *scs_data, int64_t n_scs,
    const int64_t *inst, int64_t n_inst,
    const u32 *outputs,
    const u32 *hint_in_off,
    const int64_t *levels_flat, const u32 *level_off, int64_t n_levels,
    hint_cb_t hint_cb,
    int64_t n_wires,
    u64 *values_io, uint8_t *solved_io,
    u64 *abc_out,
    char *err_out, int64_t err_len) {

    CS cs;
    memcpy(cs.F.p, p_le, 32);
    memcpy(cs.F.r2, r2_le, 32);
    cs.F.n0inv = n0inv;
    cs.terms = terms;
    cs.r1c_off = r1c_off;
    cs.scs_data = scs_data;
    cs.inst = inst;
    cs.n_inst = n_inst;
    cs.outputs = outputs;
    cs.hint_in_off = hint_in_off;
    cs.hint_cb = hint_cb;

    cs.consts.resize(n_consts);
    cs.consts_inv.resize(n_consts);
    for (int64_t i = 0; i < n_consts; i++) {
        Fe raw;
        memcpy(raw.v, consts_raw + 4 * i, 32);
        fe_to_mont(raw, cs.consts[i], cs.F);
        fe_inv(cs.consts[i], cs.consts_inv[i], cs.F);
    }

    SolveState st;
    st.values.resize(n_wires);
    st.solved.assign(solved_io, solved_io + n_wires);
    st.a.resize(n_r1c);
    st.b.resize(n_r1c);
    st.c.resize(n_r1c);
    st.err[0] = 0;
    for (int64_t i = 0; i < n_wires; i++) {
        if (st.solved[i]) {
            Fe raw;
            memcpy(raw.v, values_io + 4 * i, 32);
            fe_to_mont(raw, st.values[i], cs.F);
        } else {
            st.values[i] = Fe{{0, 0, 0, 0}};
        }
    }

    std::vector<u64> hin, hout;
    auto run_one = [&](int64_t ii, std::vector<u64> &hin_l,
                       std::vector<u64> &hout_l) -> bool {
        const int64_t *I = inst + 6 * ii;
        int kind = (int)I[0];
        int64_t cidx = I[1];
        bool ok = true;
        if (kind == K_R1C || kind == K_ASSERT) {
            ok = solve_r1c(cs, st, cidx, kind == K_ASSERT);
        } else if (kind == K_SCS) {
            ok = solve_scs(cs, st, cidx);
        } else if (kind == K_HINT) {
            int64_t o0 = I[2], o1 = I[3], h0 = I[4], h1 = I[5];
            int32_t n_in = (int32_t)(h1 - h0);
            int32_t n_out = (int32_t)(o1 - o0);
            std::vector<u64> &hin = hin_l;
            std::vector<u64> &hout = hout_l;
            hin.assign((size_t)n_in * 4, 0);
            hout.assign((size_t)n_out * 4, 0);
            for (int32_t j = 0; j < n_in; j++) {
                Fe acc;
                u32 unk;
                int nu = eval_linexp(cs, st,
                                     cs.hint_in_off[2 * (h0 + j)],
                                     cs.hint_in_off[2 * (h0 + j) + 1],
                                     acc, unk);
                if (nu) {
                    snprintf(st.err, sizeof(st.err),
                             "hint input %d has unsolved wires", j);
                    ok = false;
                    break;
                }
                Fe raw;
                fe_from_mont(acc, raw, cs.F);
                memcpy(hin.data() + 4 * j, raw.v, 32);
            }
            if (ok) {
                int rc = cs.hint_cb((int32_t)ii, hin.data(), n_in,
                                    hout.data(), n_out);
                if (rc != 0) {
                    snprintf(st.err, sizeof(st.err),
                             "hint failed (instruction %lld)",
                             (long long)ii);
                    ok = false;
                } else {
                    for (int32_t j = 0; j < n_out; j++) {
                        Fe raw;
                        memcpy(raw.v, hout.data() + 4 * j, 32);
                        u32 w = cs.outputs[o0 + j];
                        fe_to_mont(raw, st.values[w], cs.F);
                        st.solved[w] = 1;
                    }
                }
            }
        }  // K_LOG ignored natively (python handles logs)
        return ok;
    };

    // level-parallel execution (reference solver.go:970-1077): hints
    // run serially on this thread (they call back into Python); the
    // remaining instructions in a level are independent by
    // construction (an intra-level dependency would have forced a
    // higher level) and are split across worker threads.
    // thread spawn+join costs ~0.1ms per level; only parallelize levels
    // wide enough to amortize it (a pooled executor is the next step)
    const int64_t MIN_PAR = 512;
    unsigned nthreads = std::thread::hardware_concurrency();
    if (nthreads < 2) nthreads = 2;
    for (int64_t li = 0; li < n_levels; li++) {
        u32 s0 = level_off[li], s1 = level_off[li + 1];
        // hints first (serial)
        for (u32 s = s0; s < s1; s++) {
            int64_t ii = levels_flat[s];
            if ((int)inst[6 * ii] == K_HINT) {
                if (!run_one(ii, hin, hout)) {
                    snprintf(err_out, err_len, "%s", st.err);
                    return 1;
                }
            }
        }
        int64_t rest = 0;
        for (u32 s = s0; s < s1; s++)
            if ((int)inst[6 * levels_flat[s]] != K_HINT) rest++;
        if (rest < MIN_PAR) {
            for (u32 s = s0; s < s1; s++) {
                int64_t ii = levels_flat[s];
                if ((int)inst[6 * ii] == K_HINT) continue;
                if (!run_one(ii, hin, hout)) {
                    snprintf(err_out, err_len, "%s", st.err);
                    return 1;
                }
            }
        } else {
            std::atomic<bool> failed(false);
            std::atomic<unsigned> spawned(0);
            std::vector<std::thread> workers;
            auto work = [&](unsigned t, unsigned stride) {
                std::vector<u64> hin_t, hout_t;
                for (u32 s = s0 + t; s < s1; s += stride) {
                    if (failed.load(std::memory_order_relaxed)) return;
                    int64_t ii = levels_flat[s];
                    if ((int)inst[6 * ii] == K_HINT) continue;
                    if (!run_one(ii, hin_t, hout_t))
                        failed.store(true);
                }
            };
            // thread creation can fail under load (container limits,
            // XLA's own pools) — fall back to running the remaining
            // stripes on this thread instead of letting the
            // std::system_error terminate the process.
            try {
                for (unsigned t = 1; t < nthreads; t++) {
                    workers.emplace_back(work, t, nthreads);
                    spawned++;
                }
            } catch (...) {
            }
            unsigned got = spawned.load();
            work(0, nthreads);
            for (unsigned t = got + 1; t < nthreads; t++)
                work(t, nthreads);   // stripes whose thread never spawned
            for (auto &w : workers) w.join();
            if (failed.load()) {
                snprintf(err_out, err_len, "%s", st.err);
                return 1;
            }
        }
    }

    for (int64_t i = 0; i < n_wires; i++) {
        if (!st.solved[i]) {
            snprintf(err_out, err_len, "wire %lld never solved",
                     (long long)i);
            return 2;
        }
        Fe raw;
        fe_from_mont(st.values[i], raw, cs.F);
        memcpy(values_io + 4 * i, raw.v, 32);
        solved_io[i] = 1;
    }
    for (int64_t i = 0; i < n_r1c; i++) {
        Fe raw;
        fe_from_mont(st.a[i], raw, cs.F);
        memcpy(abc_out + 4 * i, raw.v, 32);
        fe_from_mont(st.b[i], raw, cs.F);
        memcpy(abc_out + 4 * (n_r1c + i), raw.v, 32);
        fe_from_mont(st.c[i], raw, cs.F);
        memcpy(abc_out + 4 * (2 * n_r1c + i), raw.v, 32);
    }
    return 0;
}

}  // extern "C"
