// ThreadSanitizer driver for the native host runtime (april_native.cc).
//
// The reference's cross-thread audio channel is a hand-rolled "_Atomic"
// SPSC ring that silently degrades to `volatile` on MSVC (reference:
// src/audio_provider.c:25-27 `#define _Atomic volatile`) — the cautionary
// tale this framework's native runtime must not repeat. This driver
// exercises the same producer/consumer contract under TSAN:
//
//   * one producer thread pushes sequence-numbered PCM blocks of varying
//     size, one consumer pulls with varying granularity — for several
//     seconds of continuous churn across many ring generations;
//   * the consumer verifies STRICT sequence integrity (an ordering bug
//     would corrupt data even if TSAN saw no race);
//   * the time stretcher runs its documented single-owner contract on a
//     worker thread while a control thread adjusts speed (exactly the
//     api/session.py split: worker write/read, control set_speed).
//
// Build + run (tools/ci.sh "tsan" step):
//   g++ -O2 -g -std=c++17 -fsanitize=thread native/april_native.cc \
//       native/tsan_driver.cc -o tsan_driver -pthread && ./tsan_driver
//
// Exit 0 + no TSAN report = clean pass (TSAN aborts nonzero on a race).

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <thread>
#include <vector>

extern "C" {
void *an_ring_create(uint64_t capacity);
void an_ring_free(void *);
uint64_t an_ring_available(void *);
uint64_t an_ring_push(void *, const int16_t *, uint64_t);
uint64_t an_ring_pull(void *, int16_t *, uint64_t);

void *an_stretch_create(int sample_rate);
void an_stretch_free(void *);
void an_stretch_set_speed(void *, double);
double an_stretch_get_speed(void *);
void an_stretch_write(void *, const int16_t *, uint64_t);
void an_stretch_flush(void *);
uint64_t an_stretch_available(void *);
uint64_t an_stretch_read(void *, int16_t *, uint64_t);
}

namespace {

constexpr uint64_t kRingCap = 4096;
constexpr int64_t kTotal = 4'000'000;  // samples pushed end to end

int ring_test() {
  void *ring = an_ring_create(kRingCap);
  std::atomic<bool> fail{false};

  std::thread producer([&] {
    int16_t seq = 0;
    std::vector<int16_t> block;
    int64_t sent = 0;
    unsigned rnd = 12345;
    while (sent < kTotal) {
      rnd = rnd * 1103515245 + 12345;
      uint64_t n = 1 + (rnd >> 16) % 600;
      if (sent + (int64_t)n > kTotal) n = kTotal - sent;
      block.resize(n);
      for (uint64_t i = 0; i < n; ++i) block[i] = seq++;
      // all-or-nothing push: spin until the consumer drains space
      while (!an_ring_push(ring, block.data(), n)) {
        std::this_thread::yield();
      }
      sent += n;
    }
  });

  std::thread consumer([&] {
    int16_t expect = 0;
    std::vector<int16_t> out(1024);
    int64_t got = 0;
    unsigned rnd = 777;
    while (got < kTotal) {
      rnd = rnd * 1103515245 + 12345;
      uint64_t want = 1 + (rnd >> 16) % 1000;
      if (want > out.size()) want = out.size();
      uint64_t n = an_ring_pull(ring, out.data(), want);
      if (n == 0) {
        std::this_thread::yield();
        continue;
      }
      for (uint64_t i = 0; i < n; ++i) {
        if (out[i] != expect++) {
          fail.store(true);
          std::fprintf(stderr, "sequence break at %lld\n",
                       (long long)(got + i));
          return;
        }
      }
      got += n;
    }
  });

  producer.join();
  consumer.join();
  an_ring_free(ring);
  if (fail.load()) return 1;
  std::printf("ring: %lld samples, sequence intact\n", (long long)kTotal);
  return 0;
}

int stretch_test() {
  void *st = an_stretch_create(16000);
  std::atomic<bool> done{false};

  // control thread: speed changes while the worker streams (the
  // api/session.py ASYNC_RT split)
  std::thread control([&] {
    double s = 1.0;
    while (!done.load()) {
      s = s >= 2.0 ? 1.0 : s + 0.1;
      an_stretch_set_speed(st, s);
      std::this_thread::sleep_for(std::chrono::milliseconds(1));
    }
  });

  std::vector<int16_t> in(1600), out(4096);
  uint64_t consumed = 0;
  for (int iter = 0; iter < 400; ++iter) {
    for (size_t i = 0; i < in.size(); ++i)
      in[i] = (int16_t)(12000.0 * __builtin_sin(2.0 * 3.14159 * 220.0 *
                                                 (iter * 1600 + i) / 16000.0));
    an_stretch_write(st, in.data(), in.size());
    uint64_t avail = an_stretch_available(st);
    while (avail) {
      uint64_t n = an_stretch_read(st, out.data(),
                                   avail < out.size() ? avail : out.size());
      consumed += n;
      avail -= n;
    }
  }
  an_stretch_flush(st);
  consumed += an_stretch_read(st, out.data(), out.size());
  done.store(true);
  control.join();
  an_stretch_free(st);
  std::printf("stretch: consumed %llu stretched samples\n",
              (unsigned long long)consumed);
  return 0;
}

}  // namespace

int main() {
  int rc = ring_test();
  rc |= stretch_test();
  if (rc == 0) std::printf("tsan driver: all clean\n");
  return rc;
}
