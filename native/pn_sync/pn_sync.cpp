// Native PN sliding-correlator for the RX ingest hot loop.
//
// The reference's receive process runs its O(N*P) sliding cross-correlation
// in C++ on the host (rx_and_corr.cpp:332-360: corr[i] = sum_j pn[j] *
// buf[i+j], NOT conjugated, triggering at |corr|/P >= thres).  This library
// is the same arithmetic as a vectorizable C kernel, bound into Python via
// ctypes (io/native_sync.py) and used transparently by sim/pn's
// correlate_frame_start / correlate_peak -- the NumPy forms remain the
// oracle and fallback.
//
// Samples are interleaved complex float32 (re, im), the wire layout of both
// the capture files and the ring.
//
// Build: make -C native   ->  build/libpn_sync.so

#include <cmath>
#include <cstdint>

namespace {

// The one definition of the lag-i correlation magnitude |corr[i]| / p:
// first-hit, argmax, and profile variants below must stay in arithmetic
// lockstep with each other and with the sim/pn NumPy oracle.
inline float corr_mag(const float* buf, long i, const float* pn, long p) {
    float ar = 0.0f, ai = 0.0f;
    const float* b = buf + 2 * i;
    for (long j = 0; j < p; ++j) {
        const float pr = pn[2 * j], pi = pn[2 * j + 1];
        const float br = b[2 * j], bi = b[2 * j + 1];
        ar += pr * br - pi * bi;
        ai += pr * bi + pi * br;
    }
    return std::sqrt(ar * ar + ai * ai) / (float)p;
}

}  // namespace

extern "C" {

// First offset i in [0, n-p] with |sum_j pn[j]*buf[i+j]| / p >= thres
// (reference first-hit acquisition semantics).  Returns -1 when no offset
// qualifies; *peak_out then holds the maximum normalized magnitude seen.
long pn_corr_first(const float* buf, long n, const float* pn, long p,
                   float thres, float* peak_out) {
    const long last = n - p;
    float best = 0.0f;
    for (long i = 0; i <= last; ++i) {
        const float mag = corr_mag(buf, i, pn, p);
        if (mag > best) best = mag;
        if (mag >= thres) {
            if (peak_out) *peak_out = mag;
            return i;
        }
    }
    if (peak_out) *peak_out = best;
    return -1;
}

// Offset of the STRONGEST correlation lag in [0, n-p] (the synced-state
// window verify of sim/sync.StreamSynchronizer).  Returns -1 only when the
// buffer is shorter than the sequence.
long pn_corr_peak(const float* buf, long n, const float* pn, long p,
                  float* peak_out) {
    const long last = n - p;
    if (last < 0) {
        if (peak_out) *peak_out = 0.0f;
        return -1;
    }
    float best = -1.0f;
    long arg = 0;
    for (long i = 0; i <= last; ++i) {
        const float mag = corr_mag(buf, i, pn, p);
        if (mag > best) { best = mag; arg = i; }
    }
    if (peak_out) *peak_out = best;
    return arg;
}

// Full magnitude profile |corr[i]|/p into out[0 .. n-p] (debug/plotting
// parity with the reference's dumped correlator traces).  Returns the
// number of lags written (0 when the buffer is shorter than the sequence).
long pn_corr_mags(const float* buf, long n, const float* pn, long p,
                  float* out) {
    const long last = n - p;
    if (last < 0) return 0;
    for (long i = 0; i <= last; ++i) out[i] = corr_mag(buf, i, pn, p);
    return last + 1;
}

}  // extern "C"
