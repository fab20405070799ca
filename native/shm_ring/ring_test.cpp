// ring_test: standalone producer/consumer soak for the shm ring, intended
// to run under ThreadSanitizer (make -C native tsan_test).
//
// The reference's ring protocol is hand-rolled spin-waiting on plain int
// cursors -- a data race TSan would flag immediately (SURVEY.md section 5).
// This harness proves the framework's atomic head/tail protocol is clean:
// a writer thread streams sequence-stamped symbols through a small ring
// while a reader validates full FIFO order across many wraps.
//
// Exit code 0 = all symbols in order, no sanitizer reports.

#include <atomic>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {
void* ring_open(const char*, int, int, int, int, double);
void ring_close(void*);
int ring_write(void*, const float*, int, double);
int ring_read_next(void*, float*, int, int, double);
}

int main() {
  const int rows = 4, cols = 64, len = 5, n = 500;
  const char* uid = "/ring_tsan_test";

  void* w = ring_open(uid, rows, cols, len, 1, 10.0);
  if (!w) { std::fprintf(stderr, "master open failed\n"); return 2; }
  void* r = ring_open(uid, rows, cols, len, 0, 10.0);
  if (!r) { std::fprintf(stderr, "slave open failed\n"); return 2; }

  std::atomic<int> errors{0};

  std::thread producer([&] {
    std::vector<float> sym(rows * cols * 2);
    for (int k = 0; k < n; ++k) {
      for (size_t i = 0; i < sym.size(); i += 2) {
        sym[i] = static_cast<float>(k);
        sym[i + 1] = static_cast<float>(-k);
      }
      if (ring_write(w, sym.data(), 1, 10.0) != 0) {
        errors.fetch_add(1);
        return;
      }
    }
  });

  std::thread consumer([&] {
    std::vector<float> out(rows * cols * 2);
    for (int k = 0; k < n; ++k) {
      if (ring_read_next(r, out.data(), 0, 0, 10.0) != 0) {
        errors.fetch_add(1);
        return;
      }
      if (out[0] != static_cast<float>(k) || out[1] != static_cast<float>(-k)) {
        std::fprintf(stderr, "order violation at %d: got %f\n", k, out[0]);
        errors.fetch_add(1);
        return;
      }
    }
  });

  producer.join();
  consumer.join();
  ring_close(r);
  ring_close(w);
  if (errors.load() != 0) {
    std::fprintf(stderr, "FAILED with %d errors\n", errors.load());
    return 1;
  }
  std::puts("ring_test OK");
  return 0;
}
