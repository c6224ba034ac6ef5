// Native host-runtime kernels for the data pipeline.
//
// The reference assembles batches in per-row Python (zip/stack inside the
// train loop, cmu-mosei/run.py:361-363) — the host-side bottleneck at these
// model sizes (SURVEY §7.3.5).  These C++ kernels do the hot inner loops
// (bulk row gather, inf/nan sanitization, pad/truncate+mask, stride
// subsampling, summary-token computation) as single GIL-released calls.
// Exposed via ctypes; multimodal_emotion_processing_tpu/runtime/__init__.py
// builds this file with g++ on first use and falls back to numpy when
// unavailable.

#include <cmath>
#include <cstddef>
#include <cstdint>
#include <cstring>
#include <algorithm>
#include <limits>

extern "C" {

// Copy n equally-sized rows (row_elems floats each) from independent source
// buffers into one contiguous output (the batch-stack operation).
void mep_gather_rows(float* out, const float* const* srcs, int64_t n,
                     int64_t row_elems) {
    for (int64_t i = 0; i < n; ++i) {
        std::memcpy(out + i * row_elems, srcs[i],
                    sizeof(float) * static_cast<size_t>(row_elems));
    }
}

// inf/nan -> value (the reference's audio sanitization, -71.0;
// cmu-mosei/run.py:107-110).  Returns the number of replacements.
int64_t mep_sanitize(float* data, int64_t n, float value) {
    int64_t count = 0;
    for (int64_t i = 0; i < n; ++i) {
        if (!std::isfinite(data[i])) {
            data[i] = value;
            ++count;
        }
    }
    return count;
}

// Right-pad (zeros) or head-truncate src (len x dim) into out (target x dim)
// and fill mask (target) with 1/0 (Ren-MME/run.py:54-120 semantics).
void mep_pad_or_truncate(const float* src, int64_t len, int64_t dim,
                         float* out, float* mask, int64_t target) {
    const int64_t keep = std::min(len, target);
    std::memcpy(out, src, sizeof(float) * static_cast<size_t>(keep * dim));
    if (keep < target) {
        std::memset(out + keep * dim, 0,
                    sizeof(float) * static_cast<size_t>((target - keep) * dim));
    }
    for (int64_t i = 0; i < target; ++i) mask[i] = i < keep ? 1.0f : 0.0f;
}

// Stride subsampling: gap = len / target; rows 0, gap, 2*gap, ... first
// `target` kept (robot_demo.py:96-99 off-by-one semantics preserved).
void mep_stride_subsample(const float* src, int64_t len, int64_t dim,
                          float* out, int64_t target) {
    const int64_t gap = len / target;
    for (int64_t i = 0; i < target; ++i) {
        std::memcpy(out + i * dim, src + i * gap * dim,
                    sizeof(float) * static_cast<size_t>(dim));
    }
}

// Per-feature max / min / mean over len rows -> three summary rows
// (the synthetic frames prepended by cmu-mosei/run.py:132-134).
void mep_summary_rows(const float* src, int64_t len, int64_t dim,
                      float* max_row, float* min_row, float* mean_row) {
    for (int64_t j = 0; j < dim; ++j) {
        max_row[j] = -std::numeric_limits<float>::infinity();
        min_row[j] = std::numeric_limits<float>::infinity();
        mean_row[j] = 0.0f;
    }
    for (int64_t i = 0; i < len; ++i) {
        const float* row = src + i * dim;
        for (int64_t j = 0; j < dim; ++j) {
            max_row[j] = std::max(max_row[j], row[j]);
            min_row[j] = std::min(min_row[j], row[j]);
            mean_row[j] += row[j];
        }
    }
    const float inv = 1.0f / static_cast<float>(len);
    for (int64_t j = 0; j < dim; ++j) mean_row[j] *= inv;
}

// Per-row symmetric int8 quantization for the compressed H2D wire
// (data/loader.cast_for_transfer "int8"): q = round(v / s) clipped to
// ±127, s = max(row absmax / 127, 1e-12).  One fused absmax+quantize pass
// pair per row replaces numpy's ~6 full-array passes with temporaries
// (abs copy, max, divide, round, clip, astype).  Bit-equal to the numpy
// path: the same f32 division and round-half-to-even (nearbyint under the
// default FE_TONEAREST mode == np.round; __builtin_roundevenf was tried
// and is SLOWER — gcc 12 emits it as a libcall, 17.7 ms vs 9.1 ms on the
// flagship-batch microbench).
void mep_quantize_rows(const float* src, int64_t n_rows, int64_t row_elems,
                       int8_t* out, float* scales) {
    for (int64_t i = 0; i < n_rows; ++i) {
        const float* row = src + i * row_elems;
        float amax = 0.0f;
        for (int64_t j = 0; j < row_elems; ++j) {
            const float a = std::fabs(row[j]);
            if (a > amax) amax = a;
        }
        float s = amax / 127.0f;
        if (s < 1e-12f) s = 1e-12f;
        scales[i] = s;
        int8_t* orow = out + i * row_elems;
        for (int64_t j = 0; j < row_elems; ++j) {
            float q = std::nearbyint(row[j] / s);
            q = std::min(127.0f, std::max(-127.0f, q));
            orow[j] = static_cast<int8_t>(q);
        }
    }
}

}  // extern "C"
