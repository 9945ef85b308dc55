// Frame brightness/variance -> loop-filter strength inputs.
//
// Exact port of pipeline/segments.loopfilter_strength (itself mirroring the
// reference get_loopfilter_strength, /root/reference/src/vp8enc.cpp:96-127):
//   avg       = round(sum(y) / n)
//   reductor  = avg*5/255 + 3
//   s(r,c)    = floor(8-neighbour sum / 8) at interior pixels
//   div       = round(sum((y-s)^2) / ((h-1)*(w-1)))
//   sharpness = min(div/8, 7)
// The numpy version costs ~14 ms per 1080p frame on the host hot path; this
// single pass with int64 accumulation runs in ~1-2 ms.

#include <cstdint>
#include <cstddef>

extern "C" void vp8_frame_strength(const uint8_t *y, int h, int w,
                                   int32_t *out /* [reductor, sharpness] */) {
    const int64_t n = (int64_t)h * w;
    int64_t total = 0;
    for (int64_t i = 0; i < n; i++) total += y[i];
    const int avg = (int)((total + n / 2) / n);
    const int reductor = (avg * 5 / 255) + 3;

    int64_t dsum = 0;
    for (int r = 1; r < h - 1; r++) {
        const uint8_t *p0 = y + (int64_t)(r - 1) * w;
        const uint8_t *p1 = y + (int64_t)r * w;
        const uint8_t *p2 = y + (int64_t)(r + 1) * w;
        int64_t row = 0;
        for (int c = 1; c < w - 1; c++) {
            const int s = (p0[c - 1] + p0[c] + p0[c + 1] +
                           p1[c - 1] + p1[c + 1] +
                           p2[c - 1] + p2[c] + p2[c + 1]) / 8;
            const int d = (int)p1[c] - s;
            row += d * d;
        }
        dsum += row;
    }
    const int64_t denom = (int64_t)(h - 1) * (w - 1);
    const int div = (int)((dsum + denom / 2) / denom);
    const int sharp = div / 8;
    out[0] = reductor;
    out[1] = sharp > 7 ? 7 : sharp;
}
