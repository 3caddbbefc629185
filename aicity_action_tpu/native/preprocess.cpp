// Native host-side video preprocessing.
//
// TPU-native replacement for the C++ the reference leans on for its host
// data path (decord/OpenCV per-frame Python loops, SURVEY §2.9): fused
// ROI-crop → bilinear resize → /255 → mean/std normalize over a whole clip
// in one call, writing channels-last directly into the caller's buffer.
//
// The resize is SEPARABLE (horizontal pass into a float row buffer, then a
// vertical blend): ~45% fewer multiplies than the direct 4-tap form and the
// inner loops run over contiguous float rows, which the compiler
// auto-vectorizes — this host often has very few cores (1 in the dev
// environment), so single-thread throughput is the budget. OpenMP still
// parallelizes over frames when cores exist.
//
// Used by the sliding-window inference pipeline (the host-bound stage of
// the headline benchmark) through a ctypes binding; the numpy/cv2 path
// remains as a fallback when the shared library is unavailable.
//
// Build: make -C aicity_action_tpu/native   (g++ -O3 -fopenmp -shared)

#include <cstdint>
#include <cstring>
#include <algorithm>

#ifdef _OPENMP
#include <omp.h>
#endif

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

struct ResizePlan {
    int* yi0; int* yi1; float* yw;
    int* xi0; int* xi1; float* xw;
    int out_size;
};

static void plan_init(ResizePlan* pl, int out_size, int x1, int y1, int x2,
                      int y2) {
    const int cw = x2 - x1, ch = y2 - y1;
    pl->out_size = out_size;
    pl->yi0 = new int[out_size];
    pl->yi1 = new int[out_size];
    pl->yw = new float[out_size];
    pl->xi0 = new int[out_size];
    pl->xi1 = new int[out_size];
    pl->xw = new float[out_size];
    bilinear_row_weights(out_size, y1, y2, (float)ch / out_size,
                         pl->yi0, pl->yi1, pl->yw);
    bilinear_row_weights(out_size, x1, x2, (float)cw / out_size,
                         pl->xi0, pl->xi1, pl->xw);
}

static void plan_free(ResizePlan* pl) {
    delete[] pl->yi0; delete[] pl->yi1; delete[] pl->yw;
    delete[] pl->xi0; delete[] pl->xi1; delete[] pl->xw;
}

// Horizontal pass for ONE source row: u8 [W, 3] -> f32 [out, 3].
static inline void hresize_row(const uint8_t* row, const ResizePlan* pl,
                               float* dst) {
    const int n = pl->out_size;
    for (int ox = 0; ox < n; ++ox) {
        const int a = pl->xi0[ox] * 3, b = pl->xi1[ox] * 3;
        const float wx = pl->xw[ox], iwx = 1.f - wx;
        dst[ox * 3 + 0] = iwx * row[a + 0] + wx * row[b + 0];
        dst[ox * 3 + 1] = iwx * row[a + 1] + wx * row[b + 1];
        dst[ox * 3 + 2] = iwx * row[a + 2] + wx * row[b + 2];
    }
}

// One frame: separable crop+resize into f32 rows, then the caller-provided
// epilogue writes the output row. Two row caches avoid recomputing the
// horizontal pass when consecutive output rows share a source row.
template <typename Epilogue>
static void resize_frame(const uint8_t* src, int W, const ResizePlan* pl,
                         float* rbuf0, float* rbuf1, Epilogue&& emit) {
    const int n = pl->out_size;
    int cached0 = -1, cached1 = -1;
    for (int oy = 0; oy < n; ++oy) {
        const int y0 = pl->yi0[oy], y1 = pl->yi1[oy];
        if (cached0 != y0) {
            if (cached1 == y0) {  // rows advanced by one: reuse
                std::swap(rbuf0, rbuf1);
                std::swap(cached0, cached1);
            } else {
                hresize_row(src + (size_t)y0 * W * 3, pl, rbuf0);
                cached0 = y0;
            }
        }
        if (cached1 != y1) {
            hresize_row(src + (size_t)y1 * W * 3, pl, rbuf1);
            cached1 = y1;
        }
        emit(oy, rbuf0, rbuf1, pl->yw[oy]);
    }
}

extern "C" {

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
    if (x2 - x1 <= 0 || y2 - y1 <= 0) return;
    ResizePlan pl;
    plan_init(&pl, out_size, x1, y1, x2, y2);

    // per-element scale/bias rows (channel pattern pre-expanded so the
    // epilogue is a pure contiguous FMA the compiler vectorizes — an
    // i%3 lookup here blocked SIMD entirely)
    const float inv255 = 1.0f / 255.0f;
    const int n3 = out_size * 3;
    float* scale_row = new float[n3];
    float* bias_row = new float[n3];
    for (int i = 0; i < n3; ++i) {
        scale_row[i] = inv255 / stdv[i % 3];
        bias_row[i] = -mean[i % 3] / stdv[i % 3];
    }

#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (int t = 0; t < T; ++t) {
        float* rbuf0 = new float[n3];
        float* rbuf1 = new float[n3];
        const uint8_t* src = frames + (size_t)t * H * W * 3;
        float* dst = out + (size_t)t * out_size * out_size * 3;
        resize_frame(src, W, &pl, rbuf0, rbuf1,
                     [&](int oy, const float* r0, const float* r1, float wy) {
            float* drow = dst + (size_t)oy * out_size * 3;
            const float iwy = 1.f - wy;
            for (int i = 0; i < n3; ++i) {
                const float v = iwy * r0[i] + wy * r1[i];
                drow[i] = v * scale_row[i] + bias_row[i];
            }
        });
        delete[] rbuf0;
        delete[] rbuf1;
    }
    delete[] scale_row;
    delete[] bias_row;
    plan_free(&pl);
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
    if (x2 - x1 <= 0 || y2 - y1 <= 0) return;
    ResizePlan pl;
    plan_init(&pl, out_size, x1, y1, x2, y2);

#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (int t = 0; t < T; ++t) {
        float* rbuf0 = new float[out_size * 3];
        float* rbuf1 = new float[out_size * 3];
        const uint8_t* src = frames + (size_t)t * H * W * 3;
        uint8_t* dst = out + (size_t)t * out_size * out_size * 3;
        resize_frame(src, W, &pl, rbuf0, rbuf1,
                     [&](int oy, const float* r0, const float* r1, float wy) {
            uint8_t* drow = dst + (size_t)oy * out_size * 3;
            const float iwy = 1.f - wy;
            const int n3 = out_size * 3;
            for (int i = 0; i < n3; ++i) {
                const float v = iwy * r0[i] + wy * r1[i];
                int iv = (int)(v + 0.5f);
                drow[i] = (uint8_t)(iv < 0 ? 0 : (iv > 255 ? 255 : iv));
            }
        });
        delete[] rbuf0;
        delete[] rbuf1;
    }
    plan_free(&pl);
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
