// Native witness solver: multi-limb Montgomery arithmetic + leveled
// instruction interpreter.
//
// This is the TPU build's analog of the reference's per-field generated
// solver (constraint/bn254/solver.go, backed by gnark-crypto's field
// assembly): witness solving is the irregular, host-bound part of
// proving (SURVEY.md §2.4 P1 / §7 step 5), so it runs as native code
// with Python only orchestrating and providing hint callbacks.
//
// C ABI, driven from Python via ctypes (no pybind11 in the image).
// Field-generic, templated on limb count: NL=4 covers moduli to 255
// bits (BN254/BLS12-377/BLS12-381 fr), NL=6 covers BW6-761 fr (377
// bits). The entry point dispatches on the nlimbs argument.

#include <atomic>
#include <cstdint>
#include <cstring>
#include <cstdio>
#include <thread>
#include <vector>

typedef unsigned __int128 u128;
typedef uint64_t u64;
typedef uint32_t u32;

template <int NL> struct Field {
    u64 p[NL];     // modulus, little-endian limbs
    u64 r2[NL];    // R^2 mod p (for to_mont)
    u64 n0inv;     // -p^-1 mod 2^64
};

template <int NL> struct Fe { u64 v[NL]; };

template <int NL> static inline bool is_zero(const Fe<NL> &a) {
    u64 acc = 0;
    for (int i = 0; i < NL; i++) acc |= a.v[i];
    return acc == 0;
}

template <int NL>
static inline bool geq_p(const Fe<NL> &a, const Field<NL> &F) {
    for (int i = NL - 1; i >= 0; i--) {
        if (a.v[i] > F.p[i]) return true;
        if (a.v[i] < F.p[i]) return false;
    }
    return true;  // equal
}

template <int NL>
static inline void sub_p(Fe<NL> &a, const Field<NL> &F) {
    u128 borrow = 0;
    for (int i = 0; i < NL; i++) {
        u128 d = (u128)a.v[i] - F.p[i] - (u64)borrow;
        a.v[i] = (u64)d;
        borrow = (d >> 64) ? 1 : 0;
    }
}

template <int NL>
static inline void fe_add(const Fe<NL> &a, const Fe<NL> &b, Fe<NL> &r,
                          const Field<NL> &F) {
    u128 carry = 0;
    for (int i = 0; i < NL; i++) {
        u128 s = (u128)a.v[i] + b.v[i] + (u64)carry;
        r.v[i] = (u64)s;
        carry = s >> 64;
    }
    if (carry || geq_p(r, F)) sub_p(r, F);
}

template <int NL>
static inline void fe_sub(const Fe<NL> &a, const Fe<NL> &b, Fe<NL> &r,
                          const Field<NL> &F) {
    u128 borrow = 0;
    for (int i = 0; i < NL; i++) {
        u128 d = (u128)a.v[i] - b.v[i] - (u64)borrow;
        r.v[i] = (u64)d;
        borrow = (d >> 64) ? 1 : 0;
    }
    if (borrow) {  // add p back
        u128 carry = 0;
        for (int i = 0; i < NL; i++) {
            u128 s = (u128)r.v[i] + F.p[i] + (u64)carry;
            r.v[i] = (u64)s;
            carry = s >> 64;
        }
    }
}

// CIOS Montgomery multiplication
template <int NL>
static void fe_mul(const Fe<NL> &x, const Fe<NL> &y, Fe<NL> &out,
                   const Field<NL> &F) {
    u64 t[NL + 2];
    memset(t, 0, sizeof(t));
    for (int i = 0; i < NL; i++) {
        u128 carry = 0;
        for (int j = 0; j < NL; j++) {
            u128 cur = (u128)x.v[i] * y.v[j] + t[j] + (u64)carry;
            t[j] = (u64)cur;
            carry = cur >> 64;
        }
        u128 s = (u128)t[NL] + (u64)carry;
        t[NL] = (u64)s;
        t[NL + 1] = (u64)(s >> 64);

        u64 m = t[0] * F.n0inv;
        u128 cur = (u128)m * F.p[0] + t[0];
        carry = cur >> 64;
        for (int j = 1; j < NL; j++) {
            cur = (u128)m * F.p[j] + t[j] + (u64)carry;
            t[j - 1] = (u64)cur;
            carry = cur >> 64;
        }
        s = (u128)t[NL] + (u64)carry;
        t[NL - 1] = (u64)s;
        t[NL] = t[NL + 1] + (u64)(s >> 64);
        t[NL + 1] = 0;
    }
    Fe<NL> r;
    memcpy(r.v, t, NL * 8);
    if (t[NL] || geq_p(r, F)) sub_p(r, F);
    out = r;
}

template <int NL>
static void fe_to_mont(const Fe<NL> &a, Fe<NL> &r, const Field<NL> &F) {
    Fe<NL> r2;
    memcpy(r2.v, F.r2, NL * 8);
    fe_mul(a, r2, r, F);
}

template <int NL>
static void fe_from_mont(const Fe<NL> &a, Fe<NL> &r, const Field<NL> &F) {
    Fe<NL> one = {};
    one.v[0] = 1;
    fe_mul(a, one, r, F);
}

// a^(p-2) — Montgomery-domain Fermat inverse; inv(0) = 0
template <int NL>
static void fe_inv(const Fe<NL> &a, Fe<NL> &r, const Field<NL> &F) {
    u64 e[NL];
    memcpy(e, F.p, NL * 8);
    u128 borrow = 2;  // exponent p-2
    for (int i = 0; i < NL && borrow; i++) {
        u128 d = (u128)e[i] - (u64)borrow;
        e[i] = (u64)d;
        borrow = (d >> 64) ? 1 : 0;
    }
    Fe<NL> one_raw = {};
    one_raw.v[0] = 1;
    Fe<NL> result;
    fe_to_mont(one_raw, result, F);
    Fe<NL> base = a;
    for (int limb = 0; limb < NL; limb++) {
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

template <int NL> struct CS {
    Field<NL> F;
    std::vector<Fe<NL>> consts;       // Montgomery form
    std::vector<Fe<NL>> consts_inv;   // precomputed inverses (0 for 0)
    // linexp term stream: (const_idx, wire)
    const u32 *terms;
    // r1cs: per constraint 6 offsets into terms (l0,l1,r0,r1,o0,o1)
    const u32 *r1c_off;
    // scs: per constraint xa,xb,xo + 5 const idx (qL,qR,qO,qM,qC)
    //      + commitment marker (9 u32 stride)
    const u32 *scs_data;
    // instructions: kind, cidx, out0, out1, hin0, hin1
    const int64_t *inst;
    int64_t n_inst;
    const u32 *outputs;               // flat output wire ids
    // hint inputs: flat linexp offsets (start,end) pairs into terms
    const u32 *hint_in_off;
    hint_cb_t hint_cb;
};

template <int NL> struct SolveState {
    std::vector<Fe<NL>> values;       // Montgomery
    std::vector<uint8_t> solved;
    std::vector<Fe<NL>> a, b, c;      // r1cs evaluation vectors
    char err[256];
};

// evaluate linexp terms[s..e): returns count unknown; acc = known sum,
// unk_term = last unknown term index
template <int NL>
static int eval_linexp(const CS<NL> &cs, SolveState<NL> &st, u32 s, u32 e,
                       Fe<NL> &acc, u32 &unk_term) {
    int unknown = 0;
    acc = Fe<NL>{};
    for (u32 i = s; i < e; i++) {
        u32 cidx = cs.terms[2 * i];
        u32 wire = cs.terms[2 * i + 1];
        if (!st.solved[wire]) {
            unknown++;
            unk_term = i;
            continue;
        }
        Fe<NL> t;
        fe_mul(cs.consts[cidx], st.values[wire], t, cs.F);
        fe_add(acc, t, acc, cs.F);
    }
    return unknown;
}

template <int NL>
static bool solve_r1c(const CS<NL> &cs, SolveState<NL> &st, int64_t cidx,
                      bool is_assert) {
    (void)is_assert;
    const u32 *off = cs.r1c_off + 6 * cidx;
    Fe<NL> la, ra, oa;
    u32 lu = 0, ru = 0, ou = 0;
    int nl = eval_linexp(cs, st, off[0], off[1], la, lu);
    int nr = eval_linexp(cs, st, off[2], off[3], ra, ru);
    int no = eval_linexp(cs, st, off[4], off[5], oa, ou);
    Fe<NL> tmp;

    if (nl == 0 && nr == 0 && no == 0) {
        fe_mul(la, ra, tmp, cs.F);
        if (memcmp(tmp.v, oa.v, NL * 8) != 0) {
            snprintf(st.err, sizeof(st.err),
                     "constraint #%lld not satisfied", (long long)cidx);
            return false;
        }
    } else if (nl == 1 && nr == 0 && no == 0) {
        u32 w = cs.terms[2 * lu + 1];
        Fe<NL> coeff = cs.consts[cs.terms[2 * lu]];
        const Fe<NL> &ci = cs.consts_inv[cs.terms[2 * lu]];
        if (is_zero(ra)) {
            if (!is_zero(oa)) {
                snprintf(st.err, sizeof(st.err), "0*x != o at #%lld",
                         (long long)cidx);
                return false;
            }
            st.values[w] = Fe<NL>{};
        } else {
            Fe<NL> ri, t2;
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
        Fe<NL> coeff = cs.consts[cs.terms[2 * ru]];
        const Fe<NL> &ci = cs.consts_inv[cs.terms[2 * ru]];
        if (is_zero(la)) {
            if (!is_zero(oa)) {
                snprintf(st.err, sizeof(st.err), "x*0 != o at #%lld",
                         (long long)cidx);
                return false;
            }
            st.values[w] = Fe<NL>{};
        } else {
            Fe<NL> li, t2;
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
        Fe<NL> coeff = cs.consts[cs.terms[2 * ou]];
        const Fe<NL> &ci = cs.consts_inv[cs.terms[2 * ou]];
        Fe<NL> lr, t2;
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

template <int NL>
static bool solve_scs(const CS<NL> &cs, SolveState<NL> &st, int64_t cidx) {
    const u32 *d = cs.scs_data + 9 * cidx;
    if (d[8]) return true;  // PLONK commitment row: only holds under
                            // the protocol's Qcp/qk terms — skip, like
                            // the reference solveSparseR1C
    u32 xa = d[0], xb = d[1], xo = d[2];
    const Fe<NL> &qL = cs.consts[d[3]];
    const Fe<NL> &qR = cs.consts[d[4]];
    const Fe<NL> &qO = cs.consts[d[5]];
    const Fe<NL> &qM = cs.consts[d[6]];
    const Fe<NL> &qC = cs.consts[d[7]];
    Fe<NL> t1, t2, num;

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
        Fe<NL> zero = {};
        const Fe<NL> &qi = cs.consts_inv[d[5]];
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
        Fe<NL> ti, zero = {};
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
        Fe<NL> ti, zero = {};
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

template <int NL>
static int solve_impl(
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
    (void)n_terms;
    (void)n_scs;

    CS<NL> cs;
    memcpy(cs.F.p, p_le, NL * 8);
    memcpy(cs.F.r2, r2_le, NL * 8);
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
        Fe<NL> raw;
        memcpy(raw.v, consts_raw + NL * i, NL * 8);
        fe_to_mont(raw, cs.consts[i], cs.F);
    }
    // Montgomery BATCH inversion of the coefficient table: one Fermat
    // inversion total instead of one per distinct constant (a
    // 131k-constant circuit was paying ~2.6s here)
    {
        std::vector<Fe<NL>> pref(n_consts + 1);
        Fe<NL> one_m;
        Fe<NL> one_raw = {};
        one_raw.v[0] = 1;
        fe_to_mont(one_raw, one_m, cs.F);
        pref[0] = one_m;
        for (int64_t i = 0; i < n_consts; i++) {
            if (is_zero(cs.consts[i]))
                pref[i + 1] = pref[i];
            else
                fe_mul(pref[i], cs.consts[i], pref[i + 1], cs.F);
        }
        Fe<NL> acc;
        fe_inv(pref[n_consts], acc, cs.F);
        for (int64_t i = n_consts - 1; i >= 0; i--) {
            if (is_zero(cs.consts[i])) {
                cs.consts_inv[i] = Fe<NL>{};
            } else {
                fe_mul(acc, pref[i], cs.consts_inv[i], cs.F);
                fe_mul(acc, cs.consts[i], acc, cs.F);
            }
        }
    }

    SolveState<NL> st;
    st.values.resize(n_wires);
    st.solved.assign(solved_io, solved_io + n_wires);
    st.a.resize(n_r1c);
    st.b.resize(n_r1c);
    st.c.resize(n_r1c);
    st.err[0] = 0;
    for (int64_t i = 0; i < n_wires; i++) {
        if (st.solved[i]) {
            Fe<NL> raw;
            memcpy(raw.v, values_io + NL * i, NL * 8);
            fe_to_mont(raw, st.values[i], cs.F);
        } else {
            st.values[i] = Fe<NL>{};
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
            std::vector<u64> &hinr = hin_l;
            std::vector<u64> &houtr = hout_l;
            hinr.assign((size_t)n_in * NL, 0);
            houtr.assign((size_t)n_out * NL, 0);
            for (int32_t j = 0; j < n_in; j++) {
                Fe<NL> acc;
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
                Fe<NL> raw;
                fe_from_mont(acc, raw, cs.F);
                memcpy(hinr.data() + NL * j, raw.v, NL * 8);
            }
            if (ok) {
                int rc = cs.hint_cb((int32_t)ii, hinr.data(), n_in,
                                    houtr.data(), n_out);
                if (rc != 0) {
                    snprintf(st.err, sizeof(st.err),
                             "hint failed (instruction %lld)",
                             (long long)ii);
                    ok = false;
                } else {
                    for (int32_t j = 0; j < n_out; j++) {
                        Fe<NL> raw;
                        memcpy(raw.v, houtr.data() + NL * j, NL * 8);
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
        Fe<NL> raw;
        fe_from_mont(st.values[i], raw, cs.F);
        memcpy(values_io + NL * i, raw.v, NL * 8);
        solved_io[i] = 1;
    }
    for (int64_t i = 0; i < n_r1c; i++) {
        Fe<NL> raw;
        fe_from_mont(st.a[i], raw, cs.F);
        memcpy(abc_out + NL * i, raw.v, NL * 8);
        fe_from_mont(st.b[i], raw, cs.F);
        memcpy(abc_out + NL * (n_r1c + i), raw.v, NL * 8);
        fe_from_mont(st.c[i], raw, cs.F);
        memcpy(abc_out + NL * (2 * n_r1c + i), raw.v, NL * 8);
    }
    return 0;
}

extern "C" {

// returns 0 on success; on failure, err_out gets the message.
// values_io: (n_wires x nlimbs) u64 raw little-endian; input wires
// pre-set with solved_io[i] = 1. On success all wires filled (raw
// form) and abc_out (3 x n_r1c x nlimbs) holds the r1cs evaluation
// vectors. nlimbs selects the field width (4 or 6 x 64-bit limbs).
int gnark_tpu_solve(
    int64_t nlimbs,
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
    if (nlimbs == 4)
        return solve_impl<4>(p_le, r2_le, n0inv, consts_raw, n_consts,
                             terms, n_terms, r1c_off, n_r1c, scs_data,
                             n_scs, inst, n_inst, outputs, hint_in_off,
                             levels_flat, level_off, n_levels, hint_cb,
                             n_wires, values_io, solved_io, abc_out,
                             err_out, err_len);
    if (nlimbs == 6)
        return solve_impl<6>(p_le, r2_le, n0inv, consts_raw, n_consts,
                             terms, n_terms, r1c_off, n_r1c, scs_data,
                             n_scs, inst, n_inst, outputs, hint_in_off,
                             levels_flat, level_off, n_levels, hint_cb,
                             n_wires, values_io, solved_io, abc_out,
                             err_out, err_len);
    snprintf(err_out, err_len, "unsupported limb count %lld",
             (long long)nlimbs);
    return 3;
}

}  // extern "C"
