// Native host-side video preprocessing.
//
// TPU-native replacement for the C++ the reference leans on for its host
// data path (decord/OpenCV per-frame Python loops, SURVEY §2.9): fused
// ROI-crop → bilinear resize → /255 → mean/std normalize over a whole clip
// in one call, OpenMP-parallel over frames, writing float32 channels-last
// directly into the caller's buffer (zero intermediate allocations).
//
// Used by the sliding-window inference pipeline (the host-bound stage of the
// headline benchmark) through a ctypes binding; the numpy/cv2 path remains
// as a fallback when the shared library is unavailable.
//
// Build: make -C aicity_action_tpu/native   (g++ -O3 -fopenmp -shared)

#include <cstdint>
#include <cstring>
#include <algorithm>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// Bilinear sample helper: half-pixel centers (matches cv2.INTER_LINEAR /
// jax.image.resize "linear" convention).
static inline void bilinear_row_weights(int out_size, int in_lo, int in_hi,
                                        float scale, int* i0, int* i1,
                                        float* w1) {
    const int in_size = in_hi - in_lo;
    for (int o = 0; o < out_size; ++o) {
        float src = (o + 0.5f) * scale - 0.5f;
        if (src < 0.f) src = 0.f;
        const float hi = (float)(in_size - 1);
        if (src > hi) src = hi;
        int lo = (int)src;
        int hi_i = lo + 1 < in_size ? lo + 1 : in_size - 1;
        i0[o] = in_lo + lo;
        i1[o] = in_lo + hi_i;
        w1[o] = src - (float)lo;
    }
}

// frames:  uint8 [T, H, W, 3] RGB
// out:     float32 [T, out_size, out_size, 3]
// ROI crop rectangle [x1, y1, x2, y2) in pixels; resize to out_size^2;
// out = (pix/255 - mean) / std.
void crop_resize_normalize(const uint8_t* frames, int T, int H, int W,
                           int x1, int y1, int x2, int y2,
                           int out_size, const float* mean,
                           const float* stdv, float* out) {
    if (x1 < 0) x1 = 0;
    if (y1 < 0) y1 = 0;
    if (x2 > W) x2 = W;
    if (y2 > H) y2 = H;
    const int cw = x2 - x1;
    const int ch = y2 - y1;
    if (cw <= 0 || ch <= 0) return;

    const float sy = (float)ch / (float)out_size;
    const float sx = (float)cw / (float)out_size;

    // precompute per-axis indices/weights once for the whole clip
    int* yi0 = new int[out_size];
    int* yi1 = new int[out_size];
    float* yw = new float[out_size];
    int* xi0 = new int[out_size];
    int* xi1 = new int[out_size];
    float* xw = new float[out_size];
    bilinear_row_weights(out_size, y1, y2, sy, yi0, yi1, yw);
    bilinear_row_weights(out_size, x1, x2, sx, xi0, xi1, xw);

    const float inv255 = 1.0f / 255.0f;
    float scale_c[3], bias_c[3];
    for (int c = 0; c < 3; ++c) {
        scale_c[c] = inv255 / stdv[c];
        bias_c[c] = -mean[c] / stdv[c];
    }

#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (int t = 0; t < T; ++t) {
        const uint8_t* src = frames + (size_t)t * H * W * 3;
        float* dst = out + (size_t)t * out_size * out_size * 3;
        for (int oy = 0; oy < out_size; ++oy) {
            const uint8_t* r0 = src + (size_t)yi0[oy] * W * 3;
            const uint8_t* r1 = src + (size_t)yi1[oy] * W * 3;
            const float wy = yw[oy];
            float* drow = dst + (size_t)oy * out_size * 3;
            for (int ox = 0; ox < out_size; ++ox) {
                const int a = xi0[ox] * 3, b = xi1[ox] * 3;
                const float wx = xw[ox];
                const float w00 = (1.f - wy) * (1.f - wx);
                const float w01 = (1.f - wy) * wx;
                const float w10 = wy * (1.f - wx);
                const float w11 = wy * wx;
                for (int c = 0; c < 3; ++c) {
                    const float v = w00 * r0[a + c] + w01 * r0[b + c]
                                  + w10 * r1[a + c] + w11 * r1[b + c];
                    drow[ox * 3 + c] = v * scale_c[c] + bias_c[c];
                }
            }
        }
    }
    delete[] yi0; delete[] yi1; delete[] yw;
    delete[] xi0; delete[] xi1; delete[] xw;
}

// Crop + bilinear resize keeping uint8 (normalization happens on-device:
// shipping u8 to the accelerator moves 4x fewer bytes than f32).
void crop_resize_u8(const uint8_t* frames, int T, int H, int W,
                    int x1, int y1, int x2, int y2,
                    int out_size, uint8_t* out) {
    if (x1 < 0) x1 = 0;
    if (y1 < 0) y1 = 0;
    if (x2 > W) x2 = W;
    if (y2 > H) y2 = H;
    const int cw = x2 - x1;
    const int ch = y2 - y1;
    if (cw <= 0 || ch <= 0) return;
    const float sy = (float)ch / (float)out_size;
    const float sx = (float)cw / (float)out_size;
    int* yi0 = new int[out_size];
    int* yi1 = new int[out_size];
    float* yw = new float[out_size];
    int* xi0 = new int[out_size];
    int* xi1 = new int[out_size];
    float* xw = new float[out_size];
    bilinear_row_weights(out_size, y1, y2, sy, yi0, yi1, yw);
    bilinear_row_weights(out_size, x1, x2, sx, xi0, xi1, xw);
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (int t = 0; t < T; ++t) {
        const uint8_t* src = frames + (size_t)t * H * W * 3;
        uint8_t* dst = out + (size_t)t * out_size * out_size * 3;
        for (int oy = 0; oy < out_size; ++oy) {
            const uint8_t* r0 = src + (size_t)yi0[oy] * W * 3;
            const uint8_t* r1 = src + (size_t)yi1[oy] * W * 3;
            const float wy = yw[oy];
            uint8_t* drow = dst + (size_t)oy * out_size * 3;
            for (int ox = 0; ox < out_size; ++ox) {
                const int a = xi0[ox] * 3, b = xi1[ox] * 3;
                const float wx = xw[ox];
                const float w00 = (1.f - wy) * (1.f - wx);
                const float w01 = (1.f - wy) * wx;
                const float w10 = wy * (1.f - wx);
                const float w11 = wy * wx;
                for (int c = 0; c < 3; ++c) {
                    const float v = w00 * r0[a + c] + w01 * r0[b + c]
                                  + w10 * r1[a + c] + w11 * r1[b + c];
                    int iv = (int)(v + 0.5f);
                    drow[ox * 3 + c] = (uint8_t)(iv < 0 ? 0
                                                 : (iv > 255 ? 255 : iv));
                }
            }
        }
    }
    delete[] yi0; delete[] yi1; delete[] yw;
    delete[] xi0; delete[] xi1; delete[] xw;
}

// Plain normalize without resize: uint8 [N, 3] pixels -> float32.
void normalize_u8(const uint8_t* src, int64_t n_pix, const float* mean,
                  const float* stdv, float* out) {
    const float inv255 = 1.0f / 255.0f;
    float scale_c[3], bias_c[3];
    for (int c = 0; c < 3; ++c) {
        scale_c[c] = inv255 / stdv[c];
        bias_c[c] = -mean[c] / stdv[c];
    }
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (int64_t i = 0; i < n_pix; ++i) {
        for (int c = 0; c < 3; ++c) {
            out[i * 3 + c] = src[i * 3 + c] * scale_c[c] + bias_c[c];
        }
    }
}

}  // extern "C"
