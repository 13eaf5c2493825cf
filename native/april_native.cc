// Native host runtime for april_asr_tpu: lock-free audio ingest + realtime
// time-stretch.
//
// TPU-native re-design of the reference's host-side C runtime components
// (reference: src/audio_provider.{c,h} — SPSC ring buffer of PCM16 between
// the caller thread and the worker thread; src/sonic/sonic.{c,h} — PICOLA
// pitch-synchronous time-stretch used by the ASYNC_RT mode to speed audio up
// when the machine can't keep realtime, fbank.c:174-186).
//
// This is a fresh implementation, not a port: the ring is a C++17
// std::atomic acquire/release SPSC queue (the reference relies on x86
// ordering of `_Atomic`/volatile), and the stretcher is a from-scratch
// pitch-synchronous overlap-add (AMDF pitch pick + Hann-less linear
// crossfade) that implements only what the ASR path needs: speed >= 1.
//
// Exposed as a flat C ABI for ctypes (no pybind11 in the image).
//
// Build: g++ -O2 -shared -fPIC -std=c++17 april_native.cc -o libapril_native.so

#include <atomic>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <new>
#include <vector>

#if defined(_WIN32)
#define AN_EXPORT extern "C" __declspec(dllexport)
#else
#define AN_EXPORT extern "C" __attribute__((visibility("default")))
#endif

// ---------------------------------------------------------------------------
// SPSC ring buffer of int16 PCM samples.
//
// Semantics mirror the reference provider (audio_provider.c): push either
// accepts the whole block or rejects it entirely (returning 0) so the caller
// can emit ERROR_CANT_KEEP_UP; pull copies out up to `max` samples.
// One producer thread, one consumer thread; head/tail are monotonically
// increasing uint64 so empty/full is unambiguous without a wasted slot.
// ---------------------------------------------------------------------------

namespace {

struct Ring {
  int16_t* buf;
  uint64_t cap;
  std::atomic<uint64_t> head{0};  // written by consumer
  std::atomic<uint64_t> tail{0};  // written by producer
  std::atomic<uint64_t> dropped{0};
};

}  // namespace

AN_EXPORT void* an_ring_create(uint64_t capacity) {
  if (capacity == 0) return nullptr;
  Ring* r = new (std::nothrow) Ring();
  if (!r) return nullptr;
  r->buf = static_cast<int16_t*>(malloc(capacity * sizeof(int16_t)));
  if (!r->buf) {
    delete r;
    return nullptr;
  }
  r->cap = capacity;
  return r;
}

AN_EXPORT void an_ring_free(void* ring) {
  Ring* r = static_cast<Ring*>(ring);
  if (!r) return;
  free(r->buf);
  delete r;
}

AN_EXPORT uint64_t an_ring_capacity(void* ring) {
  return static_cast<Ring*>(ring)->cap;
}

AN_EXPORT uint64_t an_ring_available(void* ring) {
  Ring* r = static_cast<Ring*>(ring);
  return r->tail.load(std::memory_order_acquire) -
         r->head.load(std::memory_order_acquire);
}

AN_EXPORT uint64_t an_ring_dropped(void* ring) {
  return static_cast<Ring*>(ring)->dropped.load(std::memory_order_relaxed);
}

// Returns n on success, 0 if the block does not fit (all-or-nothing, like
// ap_push_audio returning false on overflow).
AN_EXPORT uint64_t an_ring_push(void* ring, const int16_t* data, uint64_t n) {
  Ring* r = static_cast<Ring*>(ring);
  uint64_t head = r->head.load(std::memory_order_acquire);
  uint64_t tail = r->tail.load(std::memory_order_relaxed);
  if (tail - head + n > r->cap) {
    r->dropped.fetch_add(n, std::memory_order_relaxed);
    return 0;
  }
  uint64_t pos = tail % r->cap;
  uint64_t first = n < (r->cap - pos) ? n : (r->cap - pos);
  memcpy(r->buf + pos, data, first * sizeof(int16_t));
  if (n > first) memcpy(r->buf, data + first, (n - first) * sizeof(int16_t));
  r->tail.store(tail + n, std::memory_order_release);
  return n;
}

AN_EXPORT uint64_t an_ring_pull(void* ring, int16_t* out, uint64_t max) {
  Ring* r = static_cast<Ring*>(ring);
  uint64_t tail = r->tail.load(std::memory_order_acquire);
  uint64_t head = r->head.load(std::memory_order_relaxed);
  uint64_t n = tail - head;
  if (n > max) n = max;
  if (n == 0) return 0;
  uint64_t pos = head % r->cap;
  uint64_t first = n < (r->cap - pos) ? n : (r->cap - pos);
  memcpy(out, r->buf + pos, first * sizeof(int16_t));
  if (n > first) memcpy(out + first, r->buf, (n - first) * sizeof(int16_t));
  r->head.store(head + n, std::memory_order_release);
  return n;
}

// ---------------------------------------------------------------------------
// Pitch-synchronous time-stretch (speed >= 1 only — the realtime catch-up
// path; the reference clamps to >= 1 too, april_session.c:471).
//
// Algorithm (PICOLA family, same family as the reference's vendored Sonic but
// written from scratch):
//   * pick the local pitch period P in [sample_rate/400, sample_rate/65] by
//     minimizing the average magnitude difference (AMDF) between x[0:P] and
//     x[P:2P];
//   * emit crossfade(x[0:P], x[P:2P]) — P samples out for 2P in, i.e. local
//     speed 2.0;
//   * for requested speed s in (1, 2), follow each overlap with
//     round(P*(2-s)/(s-1)) samples copied verbatim so the average rate is s;
//   * for s >= 2, skip (s-2)/ (s-1) ... approximated by consuming extra
//     input after each overlap: round(P*(s-2)) samples dropped.
// ---------------------------------------------------------------------------

namespace {

struct Stretch {
  int sample_rate;
  int min_period;
  int max_period;
  // atomic: the C contract allows a control thread to adjust speed while a
  // worker streams (api/session.py's ASYNC_RT split keeps both on the
  // worker, but the ABI must not rely on that) — a plain double here is a
  // data race (caught by native/tsan_driver.cc); relaxed ordering is
  // enough, any recent value is acceptable mid-stream.
  std::atomic<double> speed{1.0};
  std::vector<int16_t> pending;  // unconsumed input
  std::vector<int16_t> out;      // produced output not yet read
};

int find_pitch_period(const int16_t* x, int min_p, int max_p) {
  // AMDF over a coarse-to-fine grid; fine enough for speed-up OLA.
  long best = -1;
  int best_p = min_p;
  for (int p = min_p; p <= max_p; ++p) {
    long diff = 0;
    // subsample the difference (every 4th sample) — this is a heuristic
    // pick, exactness doesn't matter
    for (int i = 0; i < p; i += 4) {
      long d = static_cast<long>(x[i]) - x[p + i];
      diff += d < 0 ? -d : d;
    }
    // normalize per-sample (diff/p*4) compare via cross-multiplication
    if (best < 0 || diff * best_p < best * p) {
      best = diff;
      best_p = p;
    }
  }
  return best_p;
}

void overlap_add(const int16_t* a, const int16_t* b, int16_t* out, int n) {
  for (int i = 0; i < n; ++i) {
    double t = n > 1 ? static_cast<double>(i) / n : 0.0;
    double v = a[i] * (1.0 - t) + b[i] * t;
    out[i] = static_cast<int16_t>(v < -32768 ? -32768 : (v > 32767 ? 32767 : v));
  }
}

}  // namespace

AN_EXPORT void* an_stretch_create(int sample_rate) {
  Stretch* s = new (std::nothrow) Stretch();
  if (!s) return nullptr;
  s->sample_rate = sample_rate;
  s->min_period = sample_rate / 400;  // 400 Hz
  s->max_period = sample_rate / 65;   // 65 Hz
  if (s->min_period < 4) s->min_period = 4;
  return s;
}

AN_EXPORT void an_stretch_free(void* st) { delete static_cast<Stretch*>(st); }

AN_EXPORT void an_stretch_set_speed(void* st, double speed) {
  Stretch* s = static_cast<Stretch*>(st);
  s->speed.store(speed < 1.0 ? 1.0 : speed, std::memory_order_relaxed);
}

AN_EXPORT double an_stretch_get_speed(void* st) {
  return static_cast<Stretch*>(st)->speed.load(std::memory_order_relaxed);
}

// Feed n input samples. Output becomes readable via an_stretch_read.
AN_EXPORT void an_stretch_write(void* st, const int16_t* data, uint64_t n) {
  Stretch* s = static_cast<Stretch*>(st);
  // one load per write call: the whole block is processed at a consistent
  // speed even if a control thread adjusts it concurrently
  const double speed = s->speed.load(std::memory_order_relaxed);
  if (speed <= 1.0 + 1e-6) {
    // passthrough fast path
    if (s->pending.empty()) {
      s->out.insert(s->out.end(), data, data + n);
      return;
    }
  }
  s->pending.insert(s->pending.end(), data, data + n);
  size_t pos = 0;
  while (true) {
    size_t avail = s->pending.size() - pos;
    if (speed <= 1.0 + 1e-6) {
      // drain passthrough
      s->out.insert(s->out.end(), s->pending.begin() + pos, s->pending.end());
      pos = s->pending.size();
      break;
    }
    if (avail < static_cast<size_t>(2 * s->max_period)) break;
    const int16_t* x = s->pending.data() + pos;
    int p = find_pitch_period(x, s->min_period, s->max_period);
    size_t old = s->out.size();
    s->out.resize(old + p);
    overlap_add(x, x + p, s->out.data() + old, p);
    pos += 2 * p;
    if (speed < 2.0) {
      // copy verbatim to dilute the 2x section down to `speed`
      long keep = static_cast<long>(p * (2.0 - speed) / (speed - 1.0) + 0.5);
      size_t left = s->pending.size() - pos;
      if (static_cast<size_t>(keep) > left) keep = static_cast<long>(left);
      s->out.insert(s->out.end(), s->pending.begin() + pos,
                    s->pending.begin() + pos + keep);
      pos += keep;
    } else if (speed > 2.0) {
      // drop extra input to push the rate above 2x
      long drop = static_cast<long>(p * (speed - 2.0) + 0.5);
      size_t left = s->pending.size() - pos;
      if (static_cast<size_t>(drop) > left) drop = static_cast<long>(left);
      pos += drop;
    }
  }
  s->pending.erase(s->pending.begin(), s->pending.begin() + pos);
}

// Flush remaining input through at the current speed (simple decimating tail).
AN_EXPORT void an_stretch_flush(void* st) {
  Stretch* s = static_cast<Stretch*>(st);
  if (s->pending.empty()) return;
  const double speed = s->speed.load(std::memory_order_relaxed);
  if (speed <= 1.0 + 1e-6) {
    s->out.insert(s->out.end(), s->pending.begin(), s->pending.end());
  } else {
    // linear-interpolation resample of the short tail
    size_t n_in = s->pending.size();
    size_t n_out = static_cast<size_t>(n_in / speed);
    for (size_t i = 0; i < n_out; ++i) {
      double t = i * speed;
      size_t j = static_cast<size_t>(t);
      double frac = t - j;
      double v = j + 1 < n_in
                     ? s->pending[j] * (1.0 - frac) + s->pending[j + 1] * frac
                     : s->pending[j];
      s->out.push_back(static_cast<int16_t>(v));
    }
  }
  s->pending.clear();
}

AN_EXPORT uint64_t an_stretch_available(void* st) {
  return static_cast<Stretch*>(st)->out.size();
}

AN_EXPORT uint64_t an_stretch_read(void* st, int16_t* out, uint64_t max) {
  Stretch* s = static_cast<Stretch*>(st);
  uint64_t n = s->out.size() < max ? s->out.size() : max;
  memcpy(out, s->out.data(), n * sizeof(int16_t));
  s->out.erase(s->out.begin(), s->out.begin() + n);
  return n;
}

AN_EXPORT int an_version() { return 1; }
