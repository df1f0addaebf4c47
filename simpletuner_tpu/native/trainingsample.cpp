// Batched image preparation ops for the data plane.
//
// TPU-native replacement for the reference's Rust `trainingsample` wheel
// (reference: setup.py:294; used by helpers/image_manipulation/* for batched
// crop+resize — SURVEY.md §2.9).  Separable Lanczos-3 resampling matching
// PIL.Image.LANCZOS quality, plus crop and fused u8→f32 [-1,1] normalization.
// Parallelism: callers run these under Python threads — every entry point is
// pure C on caller-provided buffers, so ctypes drops the GIL and scales.
//
// Build: g++ -O3 -march=native -shared -fPIC trainingsample.cpp -o libtrainingsample.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr double kLanczosA = 3.0;

inline double sinc(double x) {
    if (x == 0.0) return 1.0;
    const double pix = M_PI * x;
    return std::sin(pix) / pix;
}

inline double lanczos(double x) {
    if (x <= -kLanczosA || x >= kLanczosA) return 0.0;
    return sinc(x) * sinc(x / kLanczosA);
}

// Precomputed resampling weights for one axis (PIL-style: widened support when
// downscaling so the kernel acts as an area-weighted low-pass filter).
struct AxisWeights {
    std::vector<int> start;     // first source index per output coord
    std::vector<int> count;     // taps per output coord
    std::vector<float> weight;  // flattened [out][tap]
    int max_taps = 0;
};

AxisWeights compute_weights(int src, int dst) {
    AxisWeights w;
    const double scale = static_cast<double>(src) / dst;
    const double filter_scale = std::max(scale, 1.0);
    const double support = kLanczosA * filter_scale;
    const int max_taps = static_cast<int>(std::ceil(support)) * 2 + 1;
    w.start.resize(dst);
    w.count.resize(dst);
    w.weight.assign(static_cast<size_t>(dst) * max_taps, 0.0f);
    w.max_taps = max_taps;

    for (int i = 0; i < dst; ++i) {
        const double center = (i + 0.5) * scale;
        int lo = static_cast<int>(std::floor(center - support));
        int hi = static_cast<int>(std::ceil(center + support));
        lo = std::max(lo, 0);
        hi = std::min(hi, src - 1);
        double total = 0.0;
        const int n = hi - lo + 1;
        std::vector<double> vals(n);
        for (int j = 0; j < n; ++j) {
            const double x = (lo + j + 0.5 - center) / filter_scale;
            vals[j] = lanczos(x);
            total += vals[j];
        }
        for (int j = 0; j < n; ++j)
            w.weight[static_cast<size_t>(i) * max_taps + j] =
                static_cast<float>(total != 0.0 ? vals[j] / total : 0.0);
        w.start[i] = lo;
        w.count[i] = n;
    }
    return w;
}

}  // namespace

extern "C" {

// Lanczos-3 resize, uint8 HWC -> uint8 HWC.
void st_resize_u8(const uint8_t* src, int sh, int sw, int c, uint8_t* dst, int dh, int dw) {
    const AxisWeights wx = compute_weights(sw, dw);
    const AxisWeights wy = compute_weights(sh, dh);

    // horizontal pass: (sh, sw, c) -> (sh, dw, c) in float; float src copy per
    // row so the tap loop vectorizes
    std::vector<float> tmp(static_cast<size_t>(sh) * dw * c);
    std::vector<float> row_f(static_cast<size_t>(sw) * c);
    for (int y = 0; y < sh; ++y) {
        const uint8_t* row = src + static_cast<size_t>(y) * sw * c;
        for (int i = 0; i < sw * c; ++i) row_f[i] = static_cast<float>(row[i]);
        float* out_row = tmp.data() + static_cast<size_t>(y) * dw * c;
        for (int x = 0; x < dw; ++x) {
            const int lo = wx.start[x];
            const int n = wx.count[x];
            const float* wp = wx.weight.data() + static_cast<size_t>(x) * wx.max_taps;
            const float* sp = row_f.data() + static_cast<size_t>(lo) * c;
            if (c == 3) {
                float a0 = 0.f, a1 = 0.f, a2 = 0.f;
                for (int j = 0; j < n; ++j) {
                    const float wj = wp[j];
                    a0 += wj * sp[j * 3 + 0];
                    a1 += wj * sp[j * 3 + 1];
                    a2 += wj * sp[j * 3 + 2];
                }
                out_row[x * 3 + 0] = a0;
                out_row[x * 3 + 1] = a1;
                out_row[x * 3 + 2] = a2;
            } else {
                for (int ch = 0; ch < c; ++ch) {
                    float acc = 0.f;
                    for (int j = 0; j < n; ++j) acc += wp[j] * sp[j * c + ch];
                    out_row[x * c + ch] = acc;
                }
            }
        }
    }
    // vertical pass: (sh, dw, c) -> (dh, dw, c); accumulate whole rows
    // (contiguous, SIMD-friendly), then clamp to u8
    const int row_elems = dw * c;
    std::vector<float> acc_row(row_elems);
    for (int y = 0; y < dh; ++y) {
        const int lo = wy.start[y];
        const int n = wy.count[y];
        const float* wp = wy.weight.data() + static_cast<size_t>(y) * wy.max_taps;
        std::fill(acc_row.begin(), acc_row.end(), 0.f);
        for (int j = 0; j < n; ++j) {
            const float wj = wp[j];
            const float* srow = tmp.data() + static_cast<size_t>(lo + j) * row_elems;
            for (int i = 0; i < row_elems; ++i) acc_row[i] += wj * srow[i];
        }
        uint8_t* out_row = dst + static_cast<size_t>(y) * row_elems;
        for (int i = 0; i < row_elems; ++i) {
            const float v = acc_row[i];
            out_row[i] = static_cast<uint8_t>(v < 0.f ? 0 : (v > 255.f ? 255 : std::lround(v)));
        }
    }
}

// Crop uint8 HWC.
void st_crop_u8(const uint8_t* src, int sh, int sw, int c, int top, int left, uint8_t* dst, int dh,
                int dw) {
    (void)sh;
    for (int y = 0; y < dh; ++y) {
        std::memcpy(dst + static_cast<size_t>(y) * dw * c,
                    src + (static_cast<size_t>(top + y) * sw + left) * c,
                    static_cast<size_t>(dw) * c);
    }
}

// Fused uint8 HWC -> float32 [-1, 1].
void st_u8_to_f32_norm(const uint8_t* src, int64_t n, float* dst) {
    constexpr float kScale = 2.0f / 255.0f;
    for (int64_t i = 0; i < n; ++i) dst[i] = src[i] * kScale - 1.0f;
}

// Resize then crop in one call (cover-resize semantics decided by caller).
void st_resize_crop_u8(const uint8_t* src, int sh, int sw, int c, int rh, int rw, int top, int left,
                       uint8_t* dst, int dh, int dw) {
    std::vector<uint8_t> resized(static_cast<size_t>(rh) * rw * c);
    st_resize_u8(src, sh, sw, c, resized.data(), rh, rw);
    st_crop_u8(resized.data(), rh, rw, c, top, left, dst, dh, dw);
}

int st_abi_version() { return 1; }

}  // extern "C"
