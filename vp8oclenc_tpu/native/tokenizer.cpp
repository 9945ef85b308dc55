// Per-frame coefficient tokenization: contexts, probability counts, and
// ordered token records — the native counterpart of the reference CPU-device
// kernels count_probs / encode_coefficients
// (/root/reference/src/CPU_kernels.cl:347-778), replacing the vectorized
// numpy fallback in entropy/tokens.py for the hot path.
//
// Single raster pass: running above/left nonzero contexts (including the
// Y2 retention rule across MBs without Y2), token classification, tree-bit
// counting into (4,8,3,11) numerator/denominator arrays, and emission-ordered
// token records appended to the owning partition's buffer (MB row r belongs
// to partition r % nparts, so a raster scan appends in emission order).
#include <cstdint>
#include <cstring>

namespace {

struct TokenRecord {
    uint8_t tok, ctx1, band, ctx3, skipfb, sign;
    uint16_t extra;
};

const int COEFF_BANDS[16] = {0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7};
const int CAT_BASE[6] = {5, 7, 11, 19, 35, 67};

inline int classify(int a) {
    if (a <= 4) return a;
    if (a <= 6) return 5;
    if (a <= 10) return 6;
    if (a <= 18) return 7;
    if (a <= 34) return 8;
    if (a <= 66) return 9;
    return 10;
}

}  // namespace

extern "C" {

// levels: (mbc, 25, 16) int16 zigzag; parts: (mbc,) int32 (0 == 16x16)
// rec_out: nparts contiguous regions of rec_stride records each
// rec_counts: (nparts,) out; num/den: (4*8*3*11,) int64 out (zero-init by
// caller); skip_out: (mbc,) uint8 out
// tok_nodes/tok_bits: (12,7) int32; tok_lens: (12,) int32
void vp8_tokenize_frame(const int16_t *levels, const int32_t *parts,
                        int mbw, int mbh, int nparts,
                        TokenRecord *rec_out, int64_t rec_stride,
                        int64_t *rec_counts,
                        int64_t *num, int64_t *den, uint8_t *skip_out,
                        const int32_t *tok_nodes, const int32_t *tok_bits,
                        const int32_t *tok_lens) {
    const int mbc = mbw * mbh;
    // running contexts
    uint8_t *above_y = new uint8_t[4 * mbw]();
    uint8_t *above_u = new uint8_t[2 * mbw]();
    uint8_t *above_v = new uint8_t[2 * mbw]();
    uint8_t *above_y2 = new uint8_t[mbw]();
    uint8_t left_y[4], left_u[2], left_v[2], left_y2;

    for (int64_t p = 0; p < nparts; ++p) rec_counts[p] = 0;

    for (int mby = 0; mby < mbh; ++mby) {
        const int part = mby % nparts;
        TokenRecord *rp = rec_out + part * rec_stride + rec_counts[part];
        int64_t nrec = 0;
        memset(left_y, 0, sizeof(left_y));
        memset(left_u, 0, sizeof(left_u));
        memset(left_v, 0, sizeof(left_v));
        left_y2 = 0;
        for (int mbx = 0; mbx < mbw; ++mbx) {
            const int mbn = mby * mbw + mbx;
            const int16_t *mb = levels + (int64_t)mbn * 25 * 16;
            const bool has_y2 = parts[mbn] == 0;

            // skip check: Y AC + chroma + (Y2 | Y DC) all zero
            int64_t nz = 0;
            for (int b = 0; b < 16 && !nz; ++b)
                for (int i = 0; i < 16; ++i)
                    if (mb[b * 16 + i]) { nz = 1; break; }
            for (int b = 16; b < 25 && !nz; ++b)
                for (int i = 0; i < 16; ++i)
                    if (mb[b * 16 + i]) { nz = 1; break; }
            if (!nz) {
                skip_out[mbn] = 1;
                for (int i = 0; i < 4; ++i) { left_y[i] = 0; above_y[mbx * 4 + i] = 0; }
                for (int i = 0; i < 2; ++i) {
                    left_u[i] = 0; above_u[mbx * 2 + i] = 0;
                    left_v[i] = 0; above_v[mbx * 2 + i] = 0;
                }
                if (has_y2) { left_y2 = 0; above_y2[mbx] = 0; }
                continue;
            }
            skip_out[mbn] = 0;

            // one block: tokenize + count + emit
            auto do_block = [&](const int16_t *coef, int first, int ctx1,
                                int ctx3) -> int {
                // find eob (= last nonzero + 1)
                int eob = first;
                for (int i = 15; i >= first; --i)
                    if (coef[i]) { eob = i + 1; break; }
                int prev_zero = 0;
                int blk_nz = 0;
                for (int i = first; i <= eob && i < 16; ++i) {
                    int v = (i < eob) ? coef[i] : 0;
                    int a = v < 0 ? -v : v;
                    int tok = (i == eob) ? 11 : classify(a);
                    if (a) blk_nz = 1;
                    const int band = COEFF_BANDS[i];
                    // count tree bits
                    const int32_t *nodes = tok_nodes + tok * 7;
                    const int32_t *bits = tok_bits + tok * 7;
                    const int len = tok_lens[tok];
                    const int64_t base = (((int64_t)ctx1 * 8 + band) * 3 + ctx3) * 11;
                    for (int s = prev_zero ? 1 : 0; s < len; ++s) {
                        num[base + nodes[s]] += 1 - bits[s];
                        den[base + nodes[s]] += 1;
                    }
                    // emit record
                    rp[nrec].tok = (uint8_t)tok;
                    rp[nrec].ctx1 = (uint8_t)ctx1;
                    rp[nrec].band = (uint8_t)band;
                    rp[nrec].ctx3 = (uint8_t)ctx3;
                    rp[nrec].skipfb = (uint8_t)prev_zero;
                    rp[nrec].sign = (uint8_t)(v < 0);
                    rp[nrec].extra =
                        (uint16_t)(tok >= 5 && tok <= 10 ? a - CAT_BASE[tok - 5] : 0);
                    ++nrec;
                    if (i == eob) break;
                    // next ctx3 / prev_zero
                    if (tok == 0) { prev_zero = 1; ctx3 = 0; }
                    else { prev_zero = 0; ctx3 = (tok == 1) ? 1 : 2; }
                }
                return blk_nz;
            };

            if (has_y2) {
                const int c3 = above_y2[mbx] + left_y2;
                const int nzf = do_block(mb + 24 * 16, 0, 1, c3);
                above_y2[mbx] = (uint8_t)nzf;
                left_y2 = (uint8_t)nzf;
            }
            const int first = has_y2 ? 1 : 0;
            const int ctx1_y = has_y2 ? 0 : 3;
            for (int b = 0; b < 16; ++b) {
                const int br = b >> 2, bc = b & 3;
                const int c3 = above_y[mbx * 4 + bc] + left_y[br];
                const int nzf = do_block(mb + b * 16, first, ctx1_y, c3);
                above_y[mbx * 4 + bc] = (uint8_t)nzf;
                left_y[br] = (uint8_t)nzf;
            }
            for (int b = 0; b < 4; ++b) {
                const int br = b >> 1, bc = b & 1;
                const int c3 = above_u[mbx * 2 + bc] + left_u[br];
                const int nzf = do_block(mb + (16 + b) * 16, 0, 2, c3);
                above_u[mbx * 2 + bc] = (uint8_t)nzf;
                left_u[br] = (uint8_t)nzf;
            }
            for (int b = 0; b < 4; ++b) {
                const int br = b >> 1, bc = b & 1;
                const int c3 = above_v[mbx * 2 + bc] + left_v[br];
                const int nzf = do_block(mb + (20 + b) * 16, 0, 2, c3);
                above_v[mbx * 2 + bc] = (uint8_t)nzf;
                left_v[br] = (uint8_t)nzf;
            }
        }
        rec_counts[part] += nrec;
    }
    delete[] above_y;
    delete[] above_u;
    delete[] above_v;
    delete[] above_y2;
}

}  // extern "C"
