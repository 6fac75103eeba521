// Native fraction assembly: the host-side hot path of the data pipeline.
//
// The reference implements its entire data engine in C++
// (currennt_lib/src/data_sets/DataSet.cpp); here the per-fraction assembly —
// padding, frame splicing with edge duplication, output_time_lag shifting,
// patType mask construction and Gaussian input noise — runs natively while
// Python orchestrates corpus loading and epoch iteration. Called via ctypes
// from lstm_rnn_tpu.data.dataset; a pure-NumPy fallback produces identical
// results (tested).
//
// Layouts match the jax side: inputs [T, B, ctx*F] float32 row-major,
// targets [T, B, O] float32 or [T, B] int32, pattypes [T, B] int8 with
// 0=NONE 1=FIRST 2=NORMAL 3=LAST.
//
// Build: make -C lstm_rnn_tpu/runtime   (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <random>

namespace {

constexpr int8_t PAT_NONE = 0, PAT_FIRST = 1, PAT_NORMAL = 2, PAT_LAST = 3;

inline int clampi(int v, int lo, int hi) {
  return v < lo ? lo : (v > hi ? hi : v);
}

}  // namespace

extern "C" {

// Fill patTypes for one sequence column. T rows, B columns, column b.
void lrt_fill_pattypes(int8_t* pattypes, int T, int B, int b, int length) {
  for (int t = 0; t < length; ++t) {
    int8_t pt = PAT_NORMAL;
    if (t == length - 1) pt = PAT_LAST;
    if (t == 0) pt = PAT_FIRST;  // FIRST wins for length-1 (DataSet.cpp:397-407)
    pattypes[t * B + b] = pt;
  }
  for (int t = length; t < T; ++t) pattypes[t * B + b] = PAT_NONE;
}

// Splice one sequence's features into the fraction input buffer.
// src: [length, F]; dst: [T, B, ctx*F] at column b; context frames are
// duplicated at the edges (DataSet.cpp:302-364).
void lrt_splice_inputs(const float* src, float* dst, int T, int B, int b,
                       int length, int F, int left, int right) {
  const int ctx = left + right + 1;
  const long row = (long)B * ctx * F;
  for (int t = 0; t < length; ++t) {
    float* out = dst + (long)t * row + (long)b * ctx * F;
    int k = 0;
    for (int off = -left; off <= right; ++off, ++k) {
      const int ts = clampi(t + off, 0, length - 1);
      std::memcpy(out + (long)k * F, src + (long)ts * F, sizeof(float) * F);
    }
  }
}

// Classification targets with output_time_lag; default class 0 for the
// first `lag` frames; -1 padding elsewhere (DataSet.cpp:369-380).
void lrt_fill_target_classes(const int32_t* src, int32_t* dst, int T, int B,
                             int b, int length, int lag) {
  for (int t = 0; t < T; ++t) {
    int32_t v = -1;
    if (t < length) v = (t >= lag) ? src[t - lag] : 0;
    dst[(long)t * B + b] = v;
  }
}

// Regression targets with output_time_lag; default value 1.0 for the first
// `lag` frames (DataSet.cpp:381-394).
void lrt_fill_target_patterns(const float* src, float* dst, int T, int B,
                              int b, int length, int O, int lag) {
  for (int t = 0; t < length; ++t) {
    float* out = dst + ((long)t * B + b) * O;
    if (t >= lag) {
      std::memcpy(out, src + (long)(t - lag) * O, sizeof(float) * O);
    } else {
      for (int j = 0; j < O; ++j) out[j] = 1.0f;
    }
  }
}

// Assemble a whole fraction in one call (avoids per-sequence ctypes
// round-trips). Sequences are given as concatenated feature/target buffers
// with offsets.
//
// inputs_cat: concatenated [sum(len), F]; targets_cat: [sum(len), O] floats
// or [sum(len)] int32 (classification). offsets[i] = start frame of seq i.
void lrt_assemble_fraction(
    const float* inputs_cat, const void* targets_cat, const int32_t* offsets,
    const int32_t* lengths, int n_seqs, int is_classification, int T, int B,
    int F, int O, int left, int right, int lag, float* out_inputs,
    void* out_targets, int8_t* out_pattypes) {
  // NB: input noise is handled on the Python path only (dataset.py gates
  // native assembly on noise_deviation == 0 — the RNG streams differ)
  const int ctx = left + right + 1;
  // zero-initialize
  std::memset(out_inputs, 0, sizeof(float) * (long)T * B * ctx * F);
  std::memset(out_pattypes, 0, (long)T * B);
  if (is_classification) {
    int32_t* tc = (int32_t*)out_targets;
    for (long i = 0; i < (long)T * B; ++i) tc[i] = -1;
  } else {
    std::memset(out_targets, 0, sizeof(float) * (long)T * B * O);
  }

  for (int i = 0; i < n_seqs; ++i) {
    const int len = lengths[i];
    const float* src = inputs_cat + (long)offsets[i] * F;
    lrt_splice_inputs(src, out_inputs, T, B, i, len, F, left, right);
    if (is_classification) {
      lrt_fill_target_classes((const int32_t*)targets_cat + offsets[i],
                              (int32_t*)out_targets, T, B, i, len, lag);
    } else {
      lrt_fill_target_patterns((const float*)targets_cat + (long)offsets[i] * O,
                               (float*)out_targets, T, B, i, len, O, lag);
    }
    lrt_fill_pattypes(out_pattypes, T, B, i, len);
  }
}

}  // extern "C"
