// Native host-side kernels for ttdg_mgm_tpu.
//
// The reference leans on C extensions for its host path: pycocotools'
// mask.so (RLE codec, used per evaluated image), d2's paste_masks
// (SURVEY.md section 2.3). This library provides the TPU-framework
// equivalents for the host side of evaluation, exposed through a plain C ABI
// consumed via ctypes (no pybind11 in the image):
//
//   * RLE decode/encode (COCO column-major run-length, raw counts)
//   * mask paste: (M, M) probability map -> image window, bilinear,
//     grid_sample(align_corners=False) semantics identical to
//     ops/mask_paste.py
//   * binary-mask Dice and intersection/union counts
//
// Build: see native/Makefile (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>

extern "C" {

// Decode run-length counts (column-major, first run = zeros) into a
// row-major uint8 mask of shape (h, w). Returns 0 on success.
int rle_decode_counts(const int64_t* counts, int64_t n_counts, int64_t h,
                      int64_t w, uint8_t* out) {
    const int64_t total = h * w;
    int64_t pos = 0;
    uint8_t val = 0;
    // write column-major stream, transposing on the fly
    for (int64_t i = 0; i < n_counts; ++i) {
        int64_t run = counts[i];
        if (run < 0 || pos + run > total) return 1;
        if (val) {
            for (int64_t k = pos; k < pos + run; ++k) {
                const int64_t col = k / h;
                const int64_t row = k % h;
                out[row * w + col] = 1;
            }
        }
        pos += run;
        val ^= 1;
    }
    return pos > total ? 1 : 0;
}

// Encode a row-major (h, w) uint8 mask into column-major run counts.
// Returns the number of counts written (<= h*w + 1).
int64_t rle_encode_counts(const uint8_t* mask, int64_t h, int64_t w,
                          int64_t* counts_out) {
    const int64_t total = h * w;
    int64_t n = 0;
    uint8_t cur = 0;
    int64_t run = 0;
    for (int64_t k = 0; k < total; ++k) {
        const int64_t col = k / h;
        const int64_t row = k % h;
        const uint8_t v = mask[row * w + col] ? 1 : 0;
        if (v == cur) {
            ++run;
        } else {
            counts_out[n++] = run;
            cur = v;
            run = 1;
        }
    }
    counts_out[n++] = run;
    return n;
}

// Paste one (m, m) float mask into an (h, w) uint8 canvas over the box
// [x1, y1, x2, y2], bilinear with zero padding, thresholded.
// Identical math to ops/mask_paste.py::paste_masks_np.
void paste_mask(const float* mask, int64_t m, float x1, float y1, float x2,
                float y2, float threshold, int64_t h, int64_t w,
                uint8_t* out /* zero-initialized (h, w) */) {
    const float bw = std::max(x2 - x1, 1e-6f);
    const float bh = std::max(y2 - y1, 1e-6f);
    const int64_t ys = std::max<int64_t>((int64_t)std::floor(y1), 0);
    const int64_t ye = std::min<int64_t>((int64_t)std::ceil(y2) + 1, h);
    const int64_t xs = std::max<int64_t>((int64_t)std::floor(x1), 0);
    const int64_t xe = std::min<int64_t>((int64_t)std::ceil(x2) + 1, w);
    for (int64_t y = ys; y < ye; ++y) {
        const float gy = (y + 0.5f - y1) / bh * m - 0.5f;
        const float fy = std::floor(gy);
        const int64_t y0 = (int64_t)fy;
        const float ly = gy - fy;
        for (int64_t x = xs; x < xe; ++x) {
            const float gx = (x + 0.5f - x1) / bw * m - 0.5f;
            const float fx = std::floor(gx);
            const int64_t x0 = (int64_t)fx;
            const float lx = gx - fx;
            auto sample = [&](int64_t yy, int64_t xx) -> float {
                if (yy < 0 || yy >= m || xx < 0 || xx >= m) return 0.0f;
                return mask[yy * m + xx];
            };
            const float v = sample(y0, x0) * (1 - ly) * (1 - lx)
                          + sample(y0, x0 + 1) * (1 - ly) * lx
                          + sample(y0 + 1, x0) * ly * (1 - lx)
                          + sample(y0 + 1, x0 + 1) * ly * lx;
            if (v >= threshold) out[y * w + x] = 1;
        }
    }
}

// Dice numerator/denominator pieces for two uint8 masks of n elements.
void mask_counts(const uint8_t* a, const uint8_t* b, int64_t n,
                 int64_t* inter, int64_t* sum_a, int64_t* sum_b) {
    int64_t i = 0, sa = 0, sb = 0;
    for (int64_t k = 0; k < n; ++k) {
        sa += a[k] != 0;
        sb += b[k] != 0;
        i += (a[k] != 0) & (b[k] != 0);
    }
    *inter = i;
    *sum_a = sa;
    *sum_b = sb;
}

}  // extern "C"
