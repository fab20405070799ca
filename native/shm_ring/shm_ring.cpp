// shm_ring: POSIX shared-memory symbol ring buffer.
//
// TPU-native re-design of the reference's IPC transport (C1+C2/C3/C4):
// CSharedMemSimple.hpp (shm_open/ftruncate/mmap wrapper) plus the
// ShMemSymBuff ring protocol (ShMemSymBuff.hpp:193-484): a fixed ring of
// `len` symbol matrices, a producer (SDR ingest process, ring *master*) and
// a consumer (demod process, *slave*), lock-free spin-waiting, with the
// reference's `size == -1` shutdown handshake (ShMemSymBuff.hpp:221-230).
//
// Protocol re-design (semantics preserved, defects removed):
//  * The reference tracks wrapping read/write cursors in plain ints, which
//    (a) is a data race and (b) conflates "full" with "empty" -- its reader
//    must stay one slot behind the writer (spin on `writePtr == p`,
//    ShMemSymBuff.hpp:271) adding a one-symbol latency bubble, and its
//    empty-start needs a `writePtr == -1` sentinel.  Here head/tail are
//    monotonically increasing 64-bit atomics with acquire/release ordering:
//    empty == (head == tail), full == (head - tail == len).  No sentinel,
//    no stay-one-behind bubble, no race.
//  * Every spin loop takes a deadline; -ETIMEDOUT instead of hanging forever
//    (the reference slave ctor spins forever, ShMemSymBuff.hpp:213-216).
//  * The no-wait write path (writeNextSymbolNoWait, ShMemSymBuff.hpp:460-482,
//    used by the live RX) drops the NEW symbol on overrun and counts it,
//    instead of silently overwriting the slot the reader may be copying.
//  * The read path can deinterleave (re,im) into planar float32 planes and
//    drop the cyclic prefix during the copy-out (ShMemSymBuff.hpp:281-294),
//    producing the exact layout the TPU feed wants with zero extra passes.
//
// Build: g++ -O2 -shared -fPIC -std=c++17 shm_ring.cpp -o libshm_ring.so -lrt -pthread

#include <atomic>
#include <chrono>
#include <cstdint>
#include <cstring>
#include <new>
#include <string>
#include <thread>
#include <type_traits>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

using Clock = std::chrono::steady_clock;

constexpr int32_t kMagic = 0x52494E47;  // "RING"

struct RingHeader {
  int32_t magic;
  int32_t rows;         // antennas
  int32_t cols;         // samples per row INCLUDING cyclic prefix
  int32_t len;          // number of symbol slots (lenOfBuffer)
  std::atomic<int32_t> size;      // len when live; -1 = shutdown sentinel
  std::atomic<int32_t> dropped;   // overrun counter (no-wait writer)
  std::atomic<int64_t> head;      // symbols written (monotonic)
  std::atomic<int64_t> tail;      // symbols consumed (monotonic)
};
static_assert(std::is_standard_layout<RingHeader>::value, "shm layout");
static_assert(sizeof(std::atomic<int32_t>) == sizeof(int32_t) &&
              sizeof(std::atomic<int64_t>) == sizeof(int64_t),
              "atomics must be layout-compatible for shm");

struct Ring {
  RingHeader* hdr = nullptr;
  float* data = nullptr;      // interleaved complex: len * rows*cols*2 floats
  size_t map_bytes = 0;
  std::string uid;
  bool master = false;
  int64_t spin_ns = 0;        // accumulated wait time (observability)
};

inline size_t slot_floats(const RingHeader* h) {
  return static_cast<size_t>(h->rows) * h->cols * 2;
}

inline float* slot_ptr(Ring* r, int64_t seq) {
  return r->data + slot_floats(r->hdr) * (seq % r->hdr->len);
}

enum : int {
  RING_OK = 0,
  RING_TIMEOUT = -1,
  RING_SHUTDOWN = -2,
  RING_BADARG = -3,
  RING_OVERRUN = -4,
};

// Spin until pred() or deadline/shutdown; RING_OK on success.
template <typename Pred>
int spin_until(Ring* r, Pred pred, double timeout_s) {
  if (pred()) return RING_OK;
  auto t0 = Clock::now();
  auto deadline = t0 + std::chrono::duration_cast<Clock::duration>(
                           std::chrono::duration<double>(timeout_s));
  int iters = 0;
  for (;;) {
    if (pred()) break;
    if (r->hdr->size.load(std::memory_order_acquire) == -1) return RING_SHUTDOWN;
    if (Clock::now() >= deadline) return RING_TIMEOUT;
    if (++iters > 64) std::this_thread::yield();
  }
  r->spin_ns += std::chrono::duration_cast<std::chrono::nanoseconds>(
                    Clock::now() - t0).count();
  return RING_OK;
}

}  // namespace

extern "C" {

// Create (master) or attach to (slave) a named ring.  Slave blocks up to
// timeout_s for the master to initialize.  Returns nullptr on failure.
void* ring_open(const char* uid, int rows, int cols, int len, int master,
                double timeout_s) {
  if (!uid || rows <= 0 || cols <= 0 || len <= 1) return nullptr;
  size_t bytes = sizeof(RingHeader) +
                 sizeof(float) * static_cast<size_t>(rows) * cols * 2 * len;

  int fd = shm_open(uid, O_CREAT | O_RDWR, S_IRUSR | S_IWUSR);
  if (fd < 0) return nullptr;
  if (ftruncate(fd, static_cast<off_t>(bytes)) != 0) {
    close(fd);
    return nullptr;
  }
  void* mem = mmap(nullptr, bytes, PROT_READ | PROT_WRITE, MAP_SHARED, fd, 0);
  close(fd);
  if (mem == MAP_FAILED) return nullptr;

  Ring* r = new (std::nothrow) Ring();
  if (!r) {
    munmap(mem, bytes);
    return nullptr;
  }
  r->hdr = static_cast<RingHeader*>(mem);
  r->data = reinterpret_cast<float*>(static_cast<char*>(mem) + sizeof(RingHeader));
  r->map_bytes = bytes;
  r->uid = uid;
  r->master = master != 0;

  if (r->master) {
    r->hdr->magic = kMagic;
    r->hdr->rows = rows;
    r->hdr->cols = cols;
    r->hdr->len = len;
    r->hdr->dropped.store(0, std::memory_order_relaxed);
    r->hdr->head.store(0, std::memory_order_relaxed);
    r->hdr->tail.store(0, std::memory_order_relaxed);
    r->hdr->size.store(len, std::memory_order_release);  // publishes init
  } else {
    auto deadline = Clock::now() + std::chrono::duration_cast<Clock::duration>(
                                       std::chrono::duration<double>(timeout_s));
    while (r->hdr->size.load(std::memory_order_acquire) <= 0 ||
           r->hdr->magic != kMagic) {
      if (Clock::now() >= deadline) {
        munmap(mem, bytes);
        delete r;
        return nullptr;
      }
      std::this_thread::yield();
    }
    if (r->hdr->rows != rows || r->hdr->cols != cols || r->hdr->len != len) {
      munmap(mem, bytes);
      delete r;
      return nullptr;
    }
  }
  return r;
}

// Shutdown handshake + unmap.  Slave sets size=-1 (telling the master to
// tear down, ShMemSymBuff.hpp:221-230); master unlinks the segment.
void ring_close(void* ring) {
  Ring* r = static_cast<Ring*>(ring);
  if (!r) return;
  if (r->master) {
    shm_unlink(r->uid.c_str());
  } else {
    r->hdr->size.store(-1, std::memory_order_release);
  }
  munmap(r->hdr, r->map_bytes);
  delete r;
}

// Mark the ring shut down without closing the mapping (either side).
void ring_shutdown(void* ring) {
  Ring* r = static_cast<Ring*>(ring);
  if (r) r->hdr->size.store(-1, std::memory_order_release);
}

int ring_rows(void* ring) { return static_cast<Ring*>(ring)->hdr->rows; }
int ring_cols(void* ring) { return static_cast<Ring*>(ring)->hdr->cols; }
int ring_len(void* ring) { return static_cast<Ring*>(ring)->hdr->len; }
int ring_dropped(void* ring) {
  return static_cast<Ring*>(ring)->hdr->dropped.load(std::memory_order_relaxed);
}
// Symbols currently buffered and unread.
int ring_available(void* ring) {
  RingHeader* h = static_cast<Ring*>(ring)->hdr;
  return static_cast<int>(h->head.load(std::memory_order_acquire) -
                          h->tail.load(std::memory_order_acquire));
}
double ring_spin_seconds(void* ring) {
  return static_cast<Ring*>(ring)->spin_ns * 1e-9;
}

// Write one symbol (rows*cols interleaved complex64 floats).
// wait=1: writeNextSymbolWithWait semantics -- backpressure on the reader
// (ShMemSymBuff.hpp:429-458).  wait=0: writeNextSymbolNoWait (live RX path,
// ShMemSymBuff.hpp:460-482) -- never blocks; on overrun the new symbol is
// dropped and counted.
int ring_write(void* ring, const float* sym, int wait, double timeout_s) {
  Ring* r = static_cast<Ring*>(ring);
  if (!r || !sym) return RING_BADARG;
  RingHeader* h = r->hdr;
  if (h->size.load(std::memory_order_acquire) == -1) return RING_SHUTDOWN;
  const size_t n = slot_floats(h);

  int64_t head = h->head.load(std::memory_order_relaxed);
  auto space = [&] {
    return head - h->tail.load(std::memory_order_acquire) < h->len;
  };
  if (wait) {
    int rc = spin_until(r, space, timeout_s);
    if (rc != RING_OK) return rc;
  } else if (!space()) {
    h->dropped.fetch_add(1, std::memory_order_relaxed);
    return RING_OVERRUN;
  }

  std::memcpy(slot_ptr(r, head), sym, n * sizeof(float));
  h->head.store(head + 1, std::memory_order_release);
  return RING_OK;
}

namespace {

// Copy slot -> out.  Interleaved complex in shm; output either interleaved
// (planar=0: [rows][cols-cp]*2 floats) or planar float32 (planar=1:
// re[rows][cols-cp] then im[rows][cols-cp]).  CP dropped on the fly
// (the read-side prefix drop of ShMemSymBuff.hpp:281-294).
void copy_out(Ring* r, int64_t seq, float* out, int cp, int planar) {
  RingHeader* h = r->hdr;
  const int rows = h->rows, cols = h->cols;
  const int keep = cols - cp;
  const float* src = slot_ptr(r, seq);
  if (!planar) {
    for (int i = 0; i < rows; ++i) {
      std::memcpy(out + static_cast<size_t>(i) * keep * 2,
                  src + (static_cast<size_t>(i) * cols + cp) * 2,
                  sizeof(float) * keep * 2);
    }
  } else {
    float* re = out;
    float* im = out + static_cast<size_t>(rows) * keep;
    for (int i = 0; i < rows; ++i) {
      const float* row = src + (static_cast<size_t>(i) * cols + cp) * 2;
      float* rre = re + static_cast<size_t>(i) * keep;
      float* rim = im + static_cast<size_t>(i) * keep;
      for (int j = 0; j < keep; ++j) {
        rre[j] = row[2 * j];
        rim[j] = row[2 * j + 1];
      }
    }
  }
}

int read_impl(void* ring, float* out, int cp, int planar, double timeout_s) {
  Ring* r = static_cast<Ring*>(ring);
  if (!r || !out) return RING_BADARG;
  RingHeader* h = r->hdr;
  if (cp < 0 || cp >= h->cols) return RING_BADARG;

  int64_t tail = h->tail.load(std::memory_order_relaxed);
  int rc = spin_until(r, [&] {
    return h->head.load(std::memory_order_acquire) > tail;
  }, timeout_s);
  if (rc != RING_OK) return rc;

  copy_out(r, tail, out, cp, planar);
  h->tail.store(tail + 1, std::memory_order_release);
  return RING_OK;
}

}  // namespace

// Block until the reader has consumed everything written (used by the
// master before teardown, replacing the reference's destructor handshake,
// ShMemSymBuff.hpp:221-230).  RING_OK once drained.
int ring_wait_drained(void* ring, double timeout_s) {
  Ring* r = static_cast<Ring*>(ring);
  if (!r) return RING_BADARG;
  RingHeader* h = r->hdr;
  return spin_until(r, [&] {
    return h->tail.load(std::memory_order_acquire) >=
           h->head.load(std::memory_order_acquire);
  }, timeout_s);
}

// Blocking read of the next symbol (readNextSymbol, ShMemSymBuff.hpp:237-297).
int ring_read_next(void* ring, float* out, int cp, int planar, double timeout_s) {
  return read_impl(ring, out, cp, planar, timeout_s);
}

// readLastSymbol (ShMemSymBuff.hpp:300-331).  With head/tail cursors the
// "don't wait for the writer before advancing" special case the reference
// needed is gone; kept as an alias for API parity.
int ring_read_last(void* ring, float* out, int cp, int planar, double timeout_s) {
  return read_impl(ring, out, cp, planar, timeout_s);
}

}  // extern "C"
