// golden_dsp: native C++ mirror of the golden OFDM LS+MRC chain.
//
// The reference's DSP core is native C++ (cpuLS.hpp); this library is its
// TPU-framework counterpart: the same math as ofdm_ls_mrc_tpu.golden.dsp,
// self-contained (no FFTW/BLAS -- the image ships neither), used for
// native-vs-NumPy cross-validation and as a host-side fallback demodulator.
//
// Conventions mirrored from the reference:
//  * pilot fftshift on load (matrix_readX, cpuLS.hpp:105-113)
//  * unnormalized forward DFT == FFTW_FORWARD (fftOneRow, cpuLS.hpp:165-174)
//  * DC-bin drop; LS divide + conjugate (firstVector, cpuLS.hpp:247-317)
//  * MRC MAC + |H|^2 normalize (doOneSymbol, cpuLS.hpp:319-389)
//  * ifftshift on the demod output (shiftOneRow, cpuLS.hpp:135-149)
//  * max-abs normalized modulator + CP prepend (modOneSymbol, cpuLS.hpp:492-529)
//
// All buffers are interleaved complex float32 (re, im), the reference's
// complexF layout (ShMemSymBuff.hpp:86-89).
//
// Build: g++ -O2 -shared -fPIC -std=c++17 golden_dsp.cpp -o libgolden_dsp.so -lm

#include <cmath>
#include <complex>
#include <cstdint>
#include <algorithm>
#include <cstring>
#include <vector>

namespace {

using cf = std::complex<float>;

inline cf* as_cf(float* p) { return reinterpret_cast<cf*>(p); }
inline const cf* as_cf(const float* p) { return reinterpret_cast<const cf*>(p); }

bool is_pow2(int n) { return n > 0 && (n & (n - 1)) == 0; }

// Iterative radix-2 Cooley-Tukey, in place, unnormalized (both directions;
// inverse is the unnormalized backward transform == FFTW_BACKWARD).
void fft_pow2(cf* x, int n, bool inverse) {
  // bit-reversal permutation
  for (int i = 1, j = 0; i < n; ++i) {
    int bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) std::swap(x[i], x[j]);
  }
  const double sgn = inverse ? 1.0 : -1.0;
  for (int len = 2; len <= n; len <<= 1) {
    const double ang = sgn * 2.0 * M_PI / len;
    const std::complex<double> wl(std::cos(ang), std::sin(ang));
    for (int i = 0; i < n; i += len) {
      std::complex<double> w(1.0, 0.0);
      for (int k = 0; k < len / 2; ++k) {
        std::complex<double> u = x[i + k];
        std::complex<double> v = std::complex<double>(x[i + k + len / 2]) * w;
        x[i + k] = cf(u + v);
        x[i + k + len / 2] = cf(u - v);
        w *= wl;
      }
    }
  }
}

// Naive O(n^2) DFT fallback for non-power-of-two sizes.
void dft_naive(cf* x, int n, bool inverse) {
  std::vector<std::complex<double>> out(n);
  const double sgn = inverse ? 1.0 : -1.0;
  for (int k = 0; k < n; ++k) {
    std::complex<double> acc(0, 0);
    for (int i = 0; i < n; ++i) {
      const double ang = sgn * 2.0 * M_PI * k * i / n;
      acc += std::complex<double>(x[i]) *
             std::complex<double>(std::cos(ang), std::sin(ang));
    }
    out[k] = acc;
  }
  for (int k = 0; k < n; ++k) x[k] = cf(out[k]);
}

void fft_inplace(cf* x, int n, bool inverse) {
  if (is_pow2(n)) fft_pow2(x, n, inverse);
  else dft_naive(x, n, inverse);
}

}  // namespace

extern "C" {

// In-place unnormalized FFT/IFFT of interleaved complex float32.
void ofdm_fft(float* data, int n, int inverse) {
  fft_inplace(as_cf(data), n, inverse != 0);
}

// Half-spectrum swap, pilot-load convention (fftshift: x[(n+1)/2:] first).
void ofdm_fftshift(float* data, int n) {
  cf* x = as_cf(data);
  std::vector<cf> tmp(x, x + n);
  const int half = n / 2;  // np.fft.fftshift == roll by +n/2
  for (int i = 0; i < n; ++i) x[(i + half) % n] = tmp[i];
}

// Half-spectrum swap, demod-output convention (ifftshift: roll by -(n/2)).
void ofdm_ifftshift(float* data, int n) {
  cf* x = as_cf(data);
  std::vector<cf> tmp(x, x + n);
  const int half = n / 2;
  for (int i = 0; i < n; ++i) x[i] = tmp[(i + half) % n];
}

// LS channel estimation from the time-domain pilot symbol.
//   pilot_td: [a][f] interleaved complex (CP already dropped)
//   pilot_x:  [f-1]  known pilot, post-fftshift (load_pilot convention)
//   hconj:    out [a][f-1]
//   hsqrd:    out [f-1] real
void ofdm_estimate(const float* pilot_td, const float* pilot_x, int a, int f,
                   float* hconj, float* hsqrd) {
  const cf* px = as_cf(pilot_x);
  cf* hc = as_cf(hconj);
  std::vector<cf> row(f);
  for (int k = 0; k < f - 1; ++k) hsqrd[k] = 0.0f;
  for (int ant = 0; ant < a; ++ant) {
    std::copy(as_cf(pilot_td) + static_cast<size_t>(ant) * f,
              as_cf(pilot_td) + static_cast<size_t>(ant + 1) * f, row.data());
    fft_inplace(row.data(), f, false);
    for (int k = 0; k < f - 1; ++k) {
      cf h = row[k + 1] / px[k];          // divideOneRow (cpuLS.hpp:233-244)
      hc[static_cast<size_t>(ant) * (f - 1) + k] = std::conj(h);
      hsqrd[k] += std::norm(h);           // findDistSqrd (cpuLS.hpp:211-228)
    }
  }
}

// MRC-demodulate one data symbol.
//   sym_td: [a][f] interleaved complex (CP already dropped)
//   out:    [f-1]
void ofdm_demod_symbol(const float* sym_td, const float* hconj,
                       const float* hsqrd, int a, int f, float* out) {
  const cf* hc = as_cf(hconj);
  cf* o = as_cf(out);
  std::vector<cf> row(f);
  std::vector<cf> acc(f - 1, cf(0, 0));
  for (int ant = 0; ant < a; ++ant) {
    std::copy(as_cf(sym_td) + static_cast<size_t>(ant) * f,
              as_cf(sym_td) + static_cast<size_t>(ant + 1) * f, row.data());
    fft_inplace(row.data(), f, false);
    for (int k = 0; k < f - 1; ++k)
      acc[k] += row[k + 1] * hc[static_cast<size_t>(ant) * (f - 1) + k];
  }
  for (int k = 0; k < f - 1; ++k) o[k] = acc[k] / hsqrd[k];
  ofdm_ifftshift(out, f - 1);             // shiftOneRow (cpuLS.hpp:368)
}

// Whole-frame demod: symbol 0 is the pilot.
//   frame:   [s][a][f+cp] interleaved complex
//   pilot_x: [f-1]
//   out:     [s-1][f-1]
int ofdm_demod_frame(const float* frame, const float* pilot_x,
                     int s, int a, int f, int cp, float* out) {
  // Guard before sizing vectors: f <= 1 (cp swallowing the symbol) would
  // wrap the size_t allocation into a bad_alloc that aborts the Python
  // process across the extern "C"/ctypes boundary.
  if (!frame || !pilot_x || !out || s < 2 || a < 1 || f < 2 || cp < 0)
    return -1;
  const int sym = f + cp;
  std::vector<float> td(static_cast<size_t>(a) * f * 2);
  auto load = [&](int si) {
    for (int ant = 0; ant < a; ++ant)
      std::memcpy(td.data() + static_cast<size_t>(ant) * f * 2,
                  frame + ((static_cast<size_t>(si) * a + ant) * sym + cp) * 2,
                  sizeof(float) * f * 2);
  };
  std::vector<float> hconj(static_cast<size_t>(a) * (f - 1) * 2);
  std::vector<float> hsqrd(f - 1);
  load(0);
  ofdm_estimate(td.data(), pilot_x, a, f, hconj.data(), hsqrd.data());
  for (int si = 1; si < s; ++si) {
    load(si);
    ofdm_demod_symbol(td.data(), hconj.data(), hsqrd.data(), a, f,
                      out + static_cast<size_t>(si - 1) * (f - 1) * 2);
  }
  return 0;
}

// OFDM modulator (modOneSymbol math): F-1 bins at grid offset 1, ifftshift,
// unnormalized IFFT, 1/max|.| scale, CP prepend.
//   data: [f-1] interleaved complex
//   out:  [f+cp]
int ofdm_modulate(const float* data, int f, int cp, float* out) {
  // cp > f would read the cyclic prefix from before the grid allocation.
  if (!data || !out || f < 2 || cp < 0 || cp > f) return -1;
  std::vector<cf> grid(f, cf(0, 0));
  std::copy(as_cf(data), as_cf(data) + (f - 1), grid.data() + 1);
  // tx_shift on the even grid (ifftShiftOneRow, cpuLS.hpp:119-132)
  ofdm_ifftshift(reinterpret_cast<float*>(grid.data()), f);
  fft_inplace(grid.data(), f, true);      // unnormalized backward
  float maxabs = 0.0f;
  for (int i = 0; i < f; ++i) maxabs = std::max(maxabs, std::abs(grid[i]));
  const float inv = 1.0f / maxabs;
  for (int i = 0; i < f; ++i) grid[i] *= inv;
  cf* o = as_cf(out);
  for (int i = 0; i < cp; ++i) o[i] = grid[f - cp + i];
  std::memcpy(o + cp, grid.data(), sizeof(cf) * f);
  return 0;
}

// Multi-user zero-forcing precoder (createZeroForcingMatrix,
// cpuLS.hpp:415-447): per subcarrier W = H^H (H H^H)^{-1}, the Moore-Penrose
// right-inverse of the users x antennas channel, so H @ W = I_users.  The
// reference builds it with cgemm + cgetrf_/cgetri_; here the U x U complex
// Gram system is solved by Gauss-Jordan with partial pivoting (U is small).
//   h: [s][u][a] interleaved complex
//   w: out [s][a][u]
void ofdm_zf_precoder(const float* h, int s, int u, int a, float* w) {
  std::vector<cf> g(static_cast<size_t>(u) * u);
  std::vector<cf> inv(static_cast<size_t>(u) * u);
  for (int sc = 0; sc < s; ++sc) {
    const cf* hs = as_cf(h) + static_cast<size_t>(sc) * u * a;
    // G = H H^H
    for (int i = 0; i < u; ++i)
      for (int j = 0; j < u; ++j) {
        cf acc(0, 0);
        for (int k = 0; k < a; ++k)
          acc += hs[static_cast<size_t>(i) * a + k] *
                 std::conj(hs[static_cast<size_t>(j) * a + k]);
        g[static_cast<size_t>(i) * u + j] = acc;
      }
    // inv = G^{-1} by Gauss-Jordan with partial pivoting.
    for (int i = 0; i < u; ++i)
      for (int j = 0; j < u; ++j)
        inv[static_cast<size_t>(i) * u + j] = (i == j) ? cf(1, 0) : cf(0, 0);
    for (int col = 0; col < u; ++col) {
      int piv = col;
      for (int r2 = col + 1; r2 < u; ++r2)
        if (std::abs(g[static_cast<size_t>(r2) * u + col]) >
            std::abs(g[static_cast<size_t>(piv) * u + col]))
          piv = r2;
      if (piv != col)
        for (int j = 0; j < u; ++j) {
          std::swap(g[static_cast<size_t>(col) * u + j],
                    g[static_cast<size_t>(piv) * u + j]);
          std::swap(inv[static_cast<size_t>(col) * u + j],
                    inv[static_cast<size_t>(piv) * u + j]);
        }
      const cf d = g[static_cast<size_t>(col) * u + col];
      for (int j = 0; j < u; ++j) {
        g[static_cast<size_t>(col) * u + j] /= d;
        inv[static_cast<size_t>(col) * u + j] /= d;
      }
      for (int r2 = 0; r2 < u; ++r2) {
        if (r2 == col) continue;
        const cf m = g[static_cast<size_t>(r2) * u + col];
        if (m == cf(0, 0)) continue;
        for (int j = 0; j < u; ++j) {
          g[static_cast<size_t>(r2) * u + j] -=
              m * g[static_cast<size_t>(col) * u + j];
          inv[static_cast<size_t>(r2) * u + j] -=
              m * inv[static_cast<size_t>(col) * u + j];
        }
      }
    }
    // W = H^H inv : [a][u]
    cf* ws = as_cf(w) + static_cast<size_t>(sc) * a * u;
    for (int i = 0; i < a; ++i)
      for (int j = 0; j < u; ++j) {
        cf acc(0, 0);
        for (int k = 0; k < u; ++k)
          acc += std::conj(hs[static_cast<size_t>(k) * a + i]) *
                 inv[static_cast<size_t>(k) * u + j];
        ws[static_cast<size_t>(i) * u + j] = acc;
      }
  }
}

// Apply the precoder (multiplyWithChannelInv, cpuLS.hpp:449-463):
//   w: [s][a][u], x: [u][s]  ->  y: [a][s]
void ofdm_apply_precoder(const float* w, const float* x, int s, int u, int a,
                         float* y) {
  const cf* wc = as_cf(w);
  const cf* xc = as_cf(x);
  cf* yc = as_cf(y);
  for (int sc = 0; sc < s; ++sc)
    for (int i = 0; i < a; ++i) {
      cf acc(0, 0);
      for (int k = 0; k < u; ++k)
        acc += wc[(static_cast<size_t>(sc) * a + i) * u + k] *
               xc[static_cast<size_t>(k) * s + sc];
      yc[static_cast<size_t>(i) * s + sc] = acc;
    }
}

}  // extern "C"
