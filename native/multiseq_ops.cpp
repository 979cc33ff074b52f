// Native host-side kernels for the multiseq data layer.
//
// The reference framework is pure Python (SURVEY §2: no native code
// anywhere); this library is the TPU build's native runtime layer for
// the host data path: NaN-padded collation and rate resampling are the
// per-batch hot loops that feed HBM, and in C++ they run at memcpy
// speed instead of numpy's per-sequence allocation churn.
//
// Exposed via a plain C ABI consumed with ctypes
// (multimodal_dmm_tpu/data/_native.py). Build: native/build.sh.

#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// NaN-pad and merge `n_seqs` sequences into one (max_len, n_seqs, dim)
// float32 batch (time-first layout, matching
// datasets/multiseq.py:341-353).
//
// seqs:    array of n_seqs pointers to float32 data, each (len_i, dim)
// lengths: per-sequence lengths
// out:     preallocated (max_len * n_seqs * dim) float32 buffer
void pad_and_merge_f32(const float** seqs, const int64_t* lengths,
                       int64_t n_seqs, int64_t max_len, int64_t dim,
                       float* out) {
    const float nanv = std::nanf("");
    // Fill with NaN first (padding), then copy rows.
    const int64_t total = max_len * n_seqs * dim;
    for (int64_t i = 0; i < total; ++i) out[i] = nanv;
    for (int64_t s = 0; s < n_seqs; ++s) {
        const float* src = seqs[s];
        const int64_t len = lengths[s] < max_len ? lengths[s] : max_len;
        for (int64_t t = 0; t < len; ++t) {
            std::memcpy(out + (t * n_seqs + s) * dim, src + t * dim,
                        dim * sizeof(float));
        }
    }
}

// Time-average downsampling by integer ratio with remainder averaging
// (datasets/multiseq.py:109-119). in: (len, dim) float64; out:
// (ceil(len/ratio), dim).
void resample_avg_f64(const double* in, int64_t len, int64_t dim,
                      int64_t ratio, double* out) {
    const int64_t n_full = len / ratio;
    for (int64_t b = 0; b < n_full; ++b) {
        for (int64_t d = 0; d < dim; ++d) {
            double acc = 0.0;
            for (int64_t r = 0; r < ratio; ++r)
                acc += in[(b * ratio + r) * dim + d];
            out[b * dim + d] = acc / (double)ratio;
        }
    }
    const int64_t rem = len - n_full * ratio;
    if (rem > 0) {
        for (int64_t d = 0; d < dim; ++d) {
            double acc = 0.0;
            for (int64_t r = 0; r < rem; ++r)
                acc += in[(n_full * ratio + r) * dim + d];
            out[n_full * dim + d] = acc / (double)rem;
        }
    }
}

// Length mask: (max_len, n_seqs) uint8, mask[t, s] = t < lengths[s]
// (datasets/multiseq.py:321-327).
void len_to_mask_u8(const int64_t* lengths, int64_t n_seqs,
                    int64_t max_len, uint8_t* out) {
    for (int64_t t = 0; t < max_len; ++t)
        for (int64_t s = 0; s < n_seqs; ++s)
            out[t * n_seqs + s] = t < lengths[s] ? 1 : 0;
}

}  // extern "C"
