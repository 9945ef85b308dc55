// Per-MB header coding: segment ids, skip flags, reference selection, intra
// modes, inter modes and motion vectors — the native counterpart of the
// reference host coder bool_encode_inter_mb_modes_and_mvs / write_mv /
// count_mv (/root/reference/src/entropy_host.cpp:209-443, 125-207, 445-540,
// 1069-1213), emitting a flat (prob, bit) stream that the caller packs with
// vp8_pack_bools (packer.cpp).
//
// Tree tables below are RFC 6386 spec constants, byte-identical to
// vp8oclenc_tpu/tables.py (asserted by tests/test_native_entropy.py).
// phase 0 = accumulate NEW-MV component statistics only (count_mv);
// phase 1 = emit the per-MB header bools.
#include <cstdint>
#include <cstdlib>
#include <cstring>

namespace {

// ---- spec trees (RFC 6386 §8.2; tables.py:70-90, 206-255) ----
const int8_t MB_SEGMENT_TREE[] = {2, 4, 0, -1, -2, -3};
const int8_t KF_YMODE_TREE[] = {-4, 2, 4, 6, 0, -1, -2, -3};
const int8_t YMODE_TREE[] = {0, 2, 4, 6, -1, -2, -3, -4};
const int8_t UV_MODE_TREE[] = {0, 2, -1, 4, -2, -3};
const int8_t BMODE_TREE[] = {0,  2, -1, 4,  -2, 6,  8,  12, -3,
                             10, -5, -6, -4, 14, -7, 16, -8, -9};
// leaf values rebased to 0 for the inter trees:
const int8_t MV_REF_TREE[] = {-2, 2, 0, 4, -1, 6, -3, -4};  // nearest,near,zero,new,split
const int8_t SPLIT_MV_TREE[] = {-3, 2, -2, 4, 0, -1};       // tb,lr,quarters,16
const int8_t SUBMV_REF_TREE[] = {0, 2, -1, 4, -2, -3};      // left,above,zero,new
const int8_t SMALL_MV_TREE[] = {2, 8, 4, 6, 0, -1, -2, -3, 10, 12, -4, -5, -6, -7};

const uint8_t KF_YMODE_PROB[] = {145, 156, 163, 128};
const uint8_t KF_UV_MODE_PROB[] = {142, 114, 183};
const uint8_t BMODE_PROB[] = {120, 90, 79, 133, 87, 85, 80, 111, 151};
const uint8_t SPLIT_MV_PROBS[] = {110, 111, 150};
const uint8_t SUBMV_REF_PROBS2[5][3] = {
    {147, 136, 18}, {106, 145, 1}, {179, 121, 1}, {223, 1, 34}, {208, 1, 1}};

// mode value constants (tables.py:204, 217, 221, 577-582)
enum { NEARESTMV = 0, NEARMV, ZEROMV, NEWMV, SPLITMV };     // rebased
enum { SUB_LEFT = 0, SUB_ABOVE, SUB_ZERO, SUB_NEW };        // rebased
const int B_PRED = 4, TM_PRED = 3, B_DC_PRED = 0;
const int MV_QUARTERS = 2;
const int REF_LAST = 0, REF_ALTREF = 2;
const int ARE8X8 = 1;

// Tree-path table: per leaf value the (prob index, bit) walk used by
// _write_tree (entropy/header.py:22-27; prob index = tree_index >> 1).
struct Paths {
    uint8_t node[16][8];
    uint8_t bit[16][8];
    int len[16];
};

void walk(const int8_t *tree, int i, uint8_t *pn, uint8_t *pb, int depth,
          Paths &P) {
    for (int b = 0; b < 2; ++b) {
        pn[depth] = (uint8_t)(i >> 1);
        pb[depth] = (uint8_t)b;
        const int child = tree[i + b];
        if (child <= 0) {
            const int v = -child;
            memcpy(P.node[v], pn, depth + 1);
            memcpy(P.bit[v], pb, depth + 1);
            P.len[v] = depth + 1;
        } else {
            walk(tree, child, pn, pb, depth + 1, P);
        }
    }
}

Paths build_paths(const int8_t *tree) {
    Paths P;
    memset(&P, 0, sizeof(P));
    uint8_t pn[8], pb[8];
    walk(tree, 0, pn, pb, 0, P);
    return P;
}

struct Out {
    uint8_t *probs;
    uint8_t *bits;
    int64_t n;
    int64_t cap;       // output capacity; overflow keeps counting, stops writing
    inline void put(int p, int b) {
        if (n < cap) {
            probs[n] = (uint8_t)p;
            bits[n] = (uint8_t)(b != 0);
        }
        ++n;
    }
    inline void tree(const Paths &P, const uint8_t *probs_tbl, int v) {
        for (int s = 0; s < P.len[v]; ++s)
            put(probs_tbl[P.node[v][s]], P.bit[v][s]);
    }
};

inline uint32_t pack_mv(int x, int y) {
    return ((uint32_t)x & 0xFFFFu) | (((uint32_t)y & 0xFFFFu) << 16);
}

// MV component writer/counter (write_mv / count_mv,
// entropy_host.cpp:125-207, 445-540).  probs layout: [is_short, sign,
// short_tree x7, long_bits x10] (tables.py:232-237).
struct MVCoder {
    const Paths &smv;
    Out *out;          // null in count phase
    int64_t *num;      // (2,19), null in emit phase
    int64_t *den;

    void component(int v, const uint8_t *p, int col) {
        const int a = v < 0 ? -v : v;
        if (out) {
            if (a <= 7) {
                out->put(p[0], 0);
                for (int s = 0; s < smv.len[a]; ++s)
                    out->put(p[2 + smv.node[a][s]], smv.bit[a][s]);
                if (a != 0) out->put(p[1], v < 0);
            } else {
                out->put(p[0], 1);
                for (int i = 0; i < 3; ++i) out->put(p[9 + i], (a >> i) & 1);
                for (int i = 9; i > 3; --i) out->put(p[9 + i], (a >> i) & 1);
                if (a & 0xFFF0) out->put(p[12], (a >> 3) & 1);
                out->put(p[1], v < 0);
            }
        } else {
            int64_t *nr = num + col * 19, *dr = den + col * 19;
            dr[0] += 1;
            if (a <= 7) {
                nr[0] += 1;
                for (int s = 0; s < smv.len[a]; ++s) {
                    const int idx = 2 + smv.node[a][s];
                    nr[idx] += 1 - smv.bit[a][s];
                    dr[idx] += 1;
                }
                if (a != 0) { nr[1] += (v > 0); dr[1] += 1; }
            } else {
                for (int i = 0; i < 3; ++i) {
                    nr[9 + i] += 1 - ((a >> i) & 1);
                    dr[9 + i] += 1;
                }
                for (int i = 9; i > 3; --i) {
                    nr[9 + i] += 1 - ((a >> i) & 1);
                    dr[9 + i] += 1;
                }
                if (a & 0xFFF0) { nr[12] += 1 - ((a >> 3) & 1); dr[12] += 1; }
                nr[1] += (v > 0);
                dr[1] += 1;
            }
        }
    }
    // bitstream codes y (row, context 0) first, then x (column, context 1)
    void mv(int dx, int dy, const uint8_t *new_mv_probs) {
        component(dy, new_mv_probs, 0);
        component(dx, new_mv_probs + 19, 1);
    }
};

}  // namespace

extern "C" {

// segment_ids/ref_frame/parts/modes: int32; mvs: (mbc,4,2) int16 x,y;
// mode_probs: (mbc,4) u8; nearest/near_raw: (mbc,) int64 packed;
// best: (mbc,2) int32; new_mv_probs: (2,19) u8; kf_bmode_prob: (10,10,9) u8;
// ymode/uvmode_probs: 4/3 u8.  out_cap = capacity of out_probs/out_bits
// (the Python caller allocates mbc*192; returns -1 on overflow).
// mv_num/mv_den: (2,19) int64, caller inits den to 1 (count_mv,
// entropy_host.cpp:452).  Returns the number of bools emitted (phase 1).
int64_t vp8_mb_headers(
    int phase, int mbw, int mbh, int is_key,
    const int32_t *segment_ids, const uint8_t *seg_probs, int has_seg,
    const uint8_t *skip, int skip_prob,
    const uint8_t *is_inter, const int32_t *ref_frame,
    int prob_intra, int prob_last, int prob_gf,
    const int32_t *parts, const int16_t *mvs, const int32_t *modes,
    const uint8_t *mode_probs,
    const int64_t *nearest_raw, const int64_t *near_raw, const int32_t *best,
    const uint8_t *new_mv_probs, const uint8_t *kf_bmode_prob,
    const uint8_t *ymode_probs, const uint8_t *uvmode_probs,
    uint8_t *out_probs, uint8_t *out_bits, int64_t out_cap,
    int64_t *mv_num, int64_t *mv_den) {
    const int mbc = mbw * mbh;
    const Paths seg_tree = build_paths(MB_SEGMENT_TREE);
    const Paths kfy_tree = build_paths(KF_YMODE_TREE);
    const Paths y_tree = build_paths(YMODE_TREE);
    const Paths uv_tree = build_paths(UV_MODE_TREE);
    const Paths b_tree = build_paths(BMODE_TREE);
    const Paths mvref_tree = build_paths(MV_REF_TREE);
    const Paths split_tree = build_paths(SPLIT_MV_TREE);
    const Paths submv_tree = build_paths(SUBMV_REF_TREE);
    const Paths smv_tree = build_paths(SMALL_MV_TREE);

    Out out{out_probs, out_bits, 0, out_cap};
    const bool emit = phase == 1;
    MVCoder mvc{smv_tree, emit ? &out : nullptr, mv_num, mv_den};

    for (int mbn = 0; mbn < mbc; ++mbn) {
        if (emit) {
            if (has_seg)
                out.tree(seg_tree, seg_probs, segment_ids[mbn]);
            out.put(skip_prob, skip[mbn]);
            if (!is_key) out.put(prob_intra, is_inter[mbn]);
        }
        if (!is_key && is_inter[mbn]) {
            const int ref = ref_frame[mbn];
            if (emit) {
                out.put(prob_last, ref != REF_LAST);
                if (ref != REF_LAST) out.put(prob_gf, ref == REF_ALTREF);
            }
            const int16_t *mv = mvs + (int64_t)mbn * 8;
            const int bx = best[mbn * 2], by = best[mbn * 2 + 1];
            // same predicate as the Python coder (entropy/header.py): only
            // ARE8X8 MBs take the SPLITMV path; ARE16X16 (and any other
            // value) codes a whole-MB mode
            if (parts[mbn] != ARE8X8) {
                const uint32_t raw = pack_mv(mv[6], mv[7]);
                if (raw == 0) {
                    if (emit) out.tree(mvref_tree, mode_probs + mbn * 4, ZEROMV);
                } else if (raw == (uint32_t)nearest_raw[mbn]) {
                    if (emit) out.tree(mvref_tree, mode_probs + mbn * 4, NEARESTMV);
                } else if (raw == (uint32_t)near_raw[mbn]) {
                    if (emit) out.tree(mvref_tree, mode_probs + mbn * 4, NEARMV);
                } else {
                    if (emit) out.tree(mvref_tree, mode_probs + mbn * 4, NEWMV);
                    mvc.mv(mv[6] - bx, mv[7] - by, new_mv_probs);
                }
            } else {  // SPLITMV quarters (entropy_host.cpp:322-441)
                if (emit) {
                    out.tree(mvref_tree, mode_probs + mbn * 4, SPLITMV);
                    out.tree(split_tree, SPLIT_MV_PROBS, MV_QUARTERS);
                }
                for (int b = 0; b < 4; ++b) {
                    const int b_row = b >> 1, b_col = b & 1;
                    int lx = 0, ly = 0, ax = 0, ay = 0;
                    if (b_col > 0) {
                        lx = mv[(b - 1) * 2]; ly = mv[(b - 1) * 2 + 1];
                    } else if (mbn % mbw > 0 && is_inter[mbn - 1]) {
                        const int16_t *n = mvs + (int64_t)(mbn - 1) * 8;
                        lx = n[(b + 1) * 2]; ly = n[(b + 1) * 2 + 1];
                    }
                    if (b_row > 0) {
                        ax = mv[(b - 2) * 2]; ay = mv[(b - 2) * 2 + 1];
                    } else if (mbn >= mbw && is_inter[mbn - mbw]) {
                        const int16_t *n = mvs + (int64_t)(mbn - mbw) * 8;
                        ax = n[(b + 2) * 2]; ay = n[(b + 2) * 2 + 1];
                    }
                    const uint32_t lraw = pack_mv(lx, ly);
                    const uint32_t araw = pack_mv(ax, ay);
                    const uint32_t traw = pack_mv(mv[b * 2], mv[b * 2 + 1]);
                    int ctx;
                    const bool lez = lraw == 0, aez = araw == 0,
                               lea = lraw == araw;
                    if (lea && lez) ctx = 4;
                    else if (lea) ctx = 3;
                    else if (aez) ctx = 2;
                    else if (lez) ctx = 1;
                    else ctx = 0;
                    const uint8_t *sp = SUBMV_REF_PROBS2[ctx];
                    if (traw == lraw) {
                        if (emit) out.tree(submv_tree, sp, SUB_LEFT);
                    } else if (traw == araw) {
                        if (emit) out.tree(submv_tree, sp, SUB_ABOVE);
                    } else if (traw == 0) {
                        if (emit) out.tree(submv_tree, sp, SUB_ZERO);
                    } else {
                        if (emit) out.tree(submv_tree, sp, SUB_NEW);
                        mvc.mv(mv[b * 2] - bx, mv[b * 2 + 1] - by, new_mv_probs);
                    }
                }
            }
        } else if (emit && is_key) {
            // kf: ymode B_PRED, bmodes with kf contexts, uv TM
            out.tree(kfy_tree, KF_YMODE_PROB, B_PRED);
            const int32_t *m = modes + (int64_t)mbn * 16;
            for (int b = 0; b < 16; ++b) {
                int ctx_a, ctx_l;
                if (mbn < mbw && b < 4) {
                    ctx_a = B_DC_PRED;
                } else {
                    const int src = b < 4 ? mbn - mbw : mbn;
                    const int idx = b < 4 ? b + 12 : b - 4;
                    ctx_a = modes[(int64_t)src * 16 + idx];
                }
                if (mbn % mbw == 0 && (b & 3) == 0) {
                    ctx_l = B_DC_PRED;
                } else {
                    const int src = (b & 3) == 0 ? mbn - 1 : mbn;
                    const int idx = (b & 3) == 0 ? b + 3 : b - 1;
                    ctx_l = modes[(int64_t)src * 16 + idx];
                }
                out.tree(b_tree,
                         kf_bmode_prob + ((int64_t)ctx_a * 10 + ctx_l) * 9,
                         m[b]);
            }
            out.tree(uv_tree, KF_UV_MODE_PROB, TM_PRED);
        } else if (emit) {
            // intra MB in inter frame: ymode B_PRED, context-free bmodes
            out.tree(y_tree, ymode_probs, B_PRED);
            const int32_t *m = modes + (int64_t)mbn * 16;
            for (int b = 0; b < 16; ++b)
                out.tree(b_tree, BMODE_PROB, m[b]);
            out.tree(uv_tree, uvmode_probs, TM_PRED);
        }
    }
    // overflow: emitted more bools than the caller's buffer holds
    if (emit && out.n > out.cap) return -1;
    return out.n;
}

}  // extern "C"
