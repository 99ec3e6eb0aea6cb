// Native host-side batch assembler for the TIE input pipeline.
//
// The per-sample hot path (reference dataset_new.py:591-663: re-unpickle the
// stay, slice the window, trim empty edge hours, build the [TIE_len, 3]
// triplet stream) runs per DataLoader worker in the reference. Here stays
// live in a flat binary cache (tools/build_record_cache.py) and whole
// batches are assembled by C++ threads directly into the caller's pinned
// numpy buffer — no GIL, no per-item Python.
//
// Semantics mirror medical_tri_modal_pilot_tpu/data/window.py exactly
// (assemble_tie + trim_nones); parity is enforced by
// tests/test_native_loader.py.
//
// Build: native/build.sh  (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <thread>
#include <vector>

namespace {

constexpr int N_FEATURES = 18;

struct StayView {
  const float* data;        // [T, 18] normalized grid
  const float* delta;       // [T, 18]
  const float* stream;      // [N, 3] concatenated per-hour events
  const int32_t* hour_off;  // [T + 1] offsets into stream rows
  int32_t T;
};

// Assemble one sample into out[tie_len * 3]; returns the input length and
// writes the non-realtime time anchor (window.py assemble_tie min_time,
// needed by the image-time arithmetic in dataset.py) to *out_min_time.
int assemble_one(const StayView& s, int key, int length, int tie_len,
                 bool realtime, bool adjust_key, float* out,
                 float* out_min_time) {
  // trim empty (None) edge hours — an hour h is empty when
  // hour_off[h+1] == hour_off[h] (window.py:trim_nones)
  int start = key - length + 1;             // original window start
  if (start < 0) {
    // possibleWinSizes guarantees length <= key+1, so this is unreachable
    // on well-formed pkls; clamp anyway so a malformed record can't drive
    // the edge-trim scan below off the front of the hour_off block
    length += start;
    start = 0;
  }
  const int orig_key = key;
  int early = 0, late = 0;
  bool first_empty = s.hour_off[start + 1] == s.hour_off[start];
  bool last_empty = s.hour_off[key + 1] == s.hour_off[key];
  if (first_empty || last_empty) {
    int first_non = -1, last_non = -1;
    for (int h = start; h <= key; ++h) {
      if (s.hour_off[h + 1] != s.hour_off[h]) {
        if (first_non < 0) first_non = h;
        last_non = h;
      }
    }
    if (first_non < 0) { first_non = start; last_non = key; }
    if (first_empty && !last_empty) {
      early = first_non - start;
    } else if (last_empty && !first_empty) {
      late = key - last_non;
    } else if (first_empty && last_empty) {
      early = first_non - start;
      late = key - last_non;
    }
    length -= early;
    if (adjust_key) key -= late;
  }

  // the carried-forward init rows come from the grid row at the ORIGINAL
  // window start (the reference slices dataSequence before the edge trim,
  // dataset_new.py:615 vs :620-637) while the timestamp arithmetic and the
  // drop condition use the ADJUSTED key/length (:645-650)
  int w0 = start < 0 ? 0 : start;

  int n_out = 0;
  const float anchor_key = static_cast<float>(key);
  float min_time = 1e30f;
  float init_times[N_FEATURES];
  for (int f = 0; f < N_FEATURES; ++f) {
    init_times[f] = -s.delta[w0 * N_FEATURES + f] +
                    static_cast<float>(key - length + 2);
  }
  // events from the original window; trimmed edge hours are empty so the
  // original bounds select exactly the kept events
  int ev_begin = s.hour_off[w0];
  int ev_end = s.hour_off[std::min<int>(orig_key + 1, s.T)];
  if (!realtime) {
    for (int f = 0; f < N_FEATURES; ++f)
      if (init_times[f] != static_cast<float>(key - length + 1))
        min_time = std::min(min_time, init_times[f]);
    for (int e = ev_begin; e < ev_end; ++e)
      min_time = std::min(min_time, s.stream[e * 3 + 0]);
    if (min_time > 1e29f) min_time = 0.f;
  }
  *out_min_time = realtime ? 0.f : min_time;
  const float shift = realtime ? anchor_key : min_time;

  for (int f = 0; f < N_FEATURES && n_out < tie_len; ++f) {
    if (init_times[f] == static_cast<float>(key - length + 1)) continue;
    out[n_out * 3 + 0] = init_times[f] - shift;
    out[n_out * 3 + 1] = s.data[w0 * N_FEATURES + f];
    out[n_out * 3 + 2] = static_cast<float>(f);
    ++n_out;
  }
  for (int e = ev_begin; e < ev_end && n_out < tie_len; ++e) {
    out[n_out * 3 + 0] = s.stream[e * 3 + 0] - shift;
    out[n_out * 3 + 1] = s.stream[e * 3 + 1];
    out[n_out * 3 + 2] = s.stream[e * 3 + 2];
    ++n_out;
  }
  return n_out;
}

}  // namespace

extern "C" {

// Batched assembly. Arrays are flat views into the record cache:
//   data/delta: per-stay grids at stay_grid_off[i] (row offsets)
//   stream:     all event rows; hour_off at stay_hour_off[i]
// keys/lengths: per-sample window selection (already sampled in Python).
// out_vslt: [B, tie_len, 3] f32 zero-initialized by caller.
// out_len:  [B] int32.  out_min_time: [B] f32 (0 under realtime).
void assemble_tie_batch(
    const float* data, const float* delta, const float* stream,
    const int32_t* hour_off,
    const int64_t* stay_grid_off, const int64_t* stay_hour_off,
    const int32_t* stay_T,
    const int32_t* sample_stay, const int32_t* keys, const int32_t* lengths,
    int batch, int tie_len, int realtime, int adjust_key,
    float* out_vslt, int32_t* out_len, float* out_min_time, int n_threads) {
  auto work = [&](int b0, int b1) {
    for (int b = b0; b < b1; ++b) {
      int st = sample_stay[b];
      StayView view{
          data + stay_grid_off[st] * N_FEATURES,
          delta + stay_grid_off[st] * N_FEATURES,
          stream,
          hour_off + stay_hour_off[st],
          stay_T[st]};
      out_len[b] = assemble_one(view, keys[b], lengths[b], tie_len,
                                realtime != 0, adjust_key != 0,
                                out_vslt + static_cast<int64_t>(b) * tie_len * 3,
                                out_min_time + b);
    }
  };
  if (n_threads <= 1 || batch <= 1) {
    work(0, batch);
    return;
  }
  n_threads = std::min(n_threads, batch);
  std::vector<std::thread> ts;
  int per = (batch + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int b0 = t * per, b1 = std::min(batch, b0 + per);
    if (b0 < b1) ts.emplace_back(work, b0, b1);
  }
  for (auto& t : ts) t.join();
}

}  // extern "C"
