// VP8 bool-range packer: the only serial stage of the encoder, in C++.
//
// Two entry points:
//   pack_bools   — pack a flat (prob, bit) stream (frame headers)
//   pack_tokens  — expand compact coefficient token records (tree path +
//                  extra bits + sign) and range-code them in one pass
//                  (device-side tokenization, host-side byte emission; the
//                  split mirrors /root/reference/src/CPU_kernels.cl:347-410)
//
// Carry propagation and flush match RFC 6386 §7.
#include <cstdint>
#include <cstring>

namespace {

struct BoolEnc {
    uint8_t *buf;
    size_t len;
    uint32_t range;
    uint32_t bottom;
    int bit_count;

    void init(uint8_t *out) {
        buf = out;
        len = 0;
        range = 255;
        bottom = 0;
        bit_count = 24;
    }
    inline void carry() {
        size_t i = len;
        while (i > 0 && buf[i - 1] == 255) buf[--i] = 0;
        if (i > 0) buf[i - 1]++;
    }
    inline void put(int prob, int bit) {
        uint32_t split = 1 + (((range - 1) * (uint32_t)prob) >> 8);
        if (bit) {
            bottom += split;
            range -= split;
        } else {
            range = split;
        }
        while (range < 128) {
            range <<= 1;
            if (bottom & 0x80000000u) carry();
            bottom <<= 1;
            if (!--bit_count) {
                buf[len++] = (uint8_t)(bottom >> 24);
                bottom &= (1u << 24) - 1;
                bit_count = 8;
            }
        }
    }
    size_t flush() {
        int c = bit_count;
        uint32_t v = bottom;
        if (v & (1u << (32 - c))) carry();
        v <<= (c & 7);
        c >>= 3;
        while (--c >= 0) v <<= 8;
        for (int i = 0; i < 4; ++i) {
            buf[len++] = (uint8_t)(v >> 24);
            v <<= 8;
        }
        return len;
    }
};

}  // namespace

extern "C" {

// out must have capacity >= n/8 + 64
size_t vp8_pack_bools(const uint8_t *probs, const uint8_t *bits, size_t n,
                      uint8_t *out) {
    BoolEnc e;
    e.init(out);
    for (size_t i = 0; i < n; ++i) e.put(probs[i], bits[i]);
    return e.flush();
}

// Token record layout (matches entropy/tokens.py TOKEN_RECORD_DTYPE):
// tok u8, ctx1 u8, band u8, ctx3 u8, skipfb u8, sign u8, extra u16  (8 bytes)
struct TokenRecord {
    uint8_t tok, ctx1, band, ctx3, skipfb, sign;
    uint16_t extra;
};

// probs: (4*8*3*11) coefficient probabilities
// tree tables: nodes/bits (12*7) int32, lens (12) int32
// pcat_probs: (6*11) u8, cat_nbits: (6) int32
size_t vp8_pack_tokens(const TokenRecord *recs, size_t n,
                       const uint8_t *probs,
                       const int32_t *tok_nodes, const int32_t *tok_bits,
                       const int32_t *tok_lens,
                       const uint8_t *pcat_probs, const int32_t *cat_nbits,
                       uint8_t *out) {
    BoolEnc e;
    e.init(out);
    for (size_t i = 0; i < n; ++i) {
        const TokenRecord &r = recs[i];
        const int tok = r.tok;
        const uint8_t *p =
            probs + (((size_t)r.ctx1 * 8 + r.band) * 3 + r.ctx3) * 11;
        const int32_t *nodes = tok_nodes + tok * 7;
        const int32_t *bits = tok_bits + tok * 7;
        const int len = tok_lens[tok];
        for (int s = r.skipfb ? 1 : 0; s < len; ++s)
            e.put(p[nodes[s]], bits[s]);
        if (tok >= 5 && tok <= 10) {   // categories: extra bits, MSB first
            const int cat = tok - 5;
            const int nb = cat_nbits[cat];
            const uint8_t *cp = pcat_probs + cat * 11;
            for (int b = nb - 1; b >= 0; --b)
                e.put(cp[nb - 1 - b], (r.extra >> b) & 1);
        }
        if (tok != 11 && tok != 0)     // sign unless EOB or DCT_0
            e.put(128, r.sign);
    }
    return e.flush();
}

}  // extern "C"
