"""Batched FFTs for the OFDM pipeline, TPU-first and complex-free.

The reference re-creates FFTW plans per call (cpuLS.hpp:165-174) and cuFFT
plans per symbol (gpuLS.cu:441-445).  Here every FFT is a traced jitted op
over the whole ``[symbols, antennas, fft]`` batch -- and, because TPUs have
no complex ALU (this backend exposes no complex dtype at all), every
implementation works on planar (re, im) float32 ``CArray`` tensors:

* ``matmul``    -- one dense DFT as 4 real MXU GEMMs.  For OFDM-sized
                   transforms the N^2 FLOPs are cheap on a 128x128 systolic
                   array and the whole transform is one fused GEMM group.
* ``four_step`` -- Cooley-Tukey N = N1*N2: two small GEMM groups plus a
                   planar twiddle multiply; O(N*(N1+N2)) FLOPs, still all-MXU.
* ``xla``       -- jnp.fft on complex64; only valid on backends with complex
                   support (CPU tests), kept as the cross-check oracle.

All paths compute the unnormalized forward DFT (== FFTW_FORWARD == np.fft.fft);
inverses are the unnormalized backward DFT (== FFTW_BACKWARD == np.fft.ifft*N,
cpuLS.hpp:152-162).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .cplx import CArray, ceinsum, cmatmul, from_const

# Matmul precision for the DFT stages.  HIGH (3-pass bf16) keeps the demod
# error ~3e-5 relative -- far below any radio EVM floor -- at ~4x the speed
# of HIGHEST (6-pass); CPU backends compute true fp32 regardless.  Switch
# with set_precision() for bit-tight golden comparisons (HIGHEST) or raw
# speed (DEFAULT, ~1e-2 error: fine for QPSK/16QAM at realistic SNR).
_PRECISION = jax.lax.Precision.HIGH


def set_precision(name: str) -> None:
    """Set DFT matmul precision: 'default' | 'high' | 'highest'.

    Read at TRACE time: only functions traced afterwards see the change.
    Already-constructed receivers (whose __init__ jitted their pipelines)
    and already-compiled shapes keep their old precision -- construct
    receivers AFTER calling this (bench.py does)."""
    global _PRECISION
    _PRECISION = {"default": jax.lax.Precision.DEFAULT,
                  "high": jax.lax.Precision.HIGH,
                  "highest": jax.lax.Precision.HIGHEST}[name.lower()]


@functools.lru_cache(maxsize=None)
def _dft_matrix(n: int, sign: float) -> np.ndarray:
    k = np.arange(n)
    return np.exp(sign * 2j * np.pi * np.outer(k, k) / n).astype(np.complex64)


@functools.lru_cache(maxsize=None)
def _twiddle(n1: int, n2: int, sign: float) -> np.ndarray:
    k1 = np.arange(n1)[:, None]
    i2 = np.arange(n2)[None, :]
    return np.exp(sign * 2j * np.pi * k1 * i2 / (n1 * n2)).astype(np.complex64)


def _split(n: int) -> tuple[int, int]:
    """Factor n = n1*n2 for the four-step decomposition.

    MXU-aligned rule: a 128-wide first-stage contraction saturates the
    128x128 systolic array, so prefer n1 = 128 whenever n divides -- measured
    4-6x faster than the sqrt-balanced (32, 32) split for n = 1024 on v5e
    despite the higher FLOP count.  Falls back to the balanced split for
    small n.
    """
    if n % 128 == 0 and n // 128 >= 2:
        return 128, n // 128
    n1 = 1 << ((n.bit_length() - 1 + 1) // 2)
    while n % n1:
        n1 >>= 1
    return max(n1, n // n1), min(n1, n // n1)


# ---------------------------------------------------------------------------
# Planar implementations (TPU path)
# ---------------------------------------------------------------------------

def fft_matmul(x: CArray, sign: float = -1.0) -> CArray:
    """Dense DFT as planar matmul: X = x @ W, W[n,k] = exp(sign*2pi i nk/N)."""
    n = x.shape[-1]
    w = from_const(_dft_matrix(n, sign))
    return cmatmul(x, w, precision=_PRECISION)


def ifft_matmul(x: CArray) -> CArray:
    return fft_matmul(x, sign=1.0)


def fft_four_step(x: CArray, sign: float = -1.0) -> CArray:
    """Four-step Cooley-Tukey FFT, planar, all-MXU.

    With n = n1*n2, input index n = n2*i1 + i2 and output k = n1*k2 + k1:
      A[.., k1, i2] = sum_i1 x[.., i1, i2] W_{n1}^{i1 k1}     (GEMM over i1)
      B             = A * W_n^{k1 i2}                          (twiddle)
      C[.., k1, k2] = sum_i2 B[.., k1, i2] W_{n2}^{i2 k2}     (GEMM over i2)
      out[.., n1*k2 + k1] = C[.., k1, k2]
    """
    n = x.shape[-1]
    n1, n2 = _split(n)
    if n2 == 1:
        return fft_matmul(x, sign)
    d1 = from_const(_dft_matrix(n1, sign))
    d2 = from_const(_dft_matrix(n2, sign))
    tw = from_const(_twiddle(n1, n2, sign))
    xs = x.reshape(x.shape[:-1] + (n1, n2))

    def stage(a: CArray, d: CArray, spec: str) -> CArray:
        return ceinsum(spec, a, d, precision=_PRECISION)

    a = stage(xs, d1, "...ij,ik->...kj")   # contract over i1 -> [.., k1, i2]
    b = a * tw                              # planar twiddle
    c = stage(b, d2, "...kj,jm->...km")     # contract over i2 -> [.., k1, k2]
    return c.swapaxes(-1, -2).reshape(x.shape)


def ifft_four_step(x: CArray) -> CArray:
    return fft_four_step(x, sign=1.0)


# ---------------------------------------------------------------------------
# Complex-dtype implementation (CPU oracle path)
# ---------------------------------------------------------------------------

def fft_xla(x: CArray) -> CArray:
    """jnp.fft.fft on complex64 -- backends with complex support only."""
    xc = jax.lax.complex(x.re, x.im)
    y = jnp.fft.fft(xc, axis=-1)
    return CArray(jnp.real(y).astype(jnp.float32), jnp.imag(y).astype(jnp.float32))


def ifft_xla(x: CArray) -> CArray:
    xc = jax.lax.complex(x.re, x.im)
    y = jnp.fft.ifft(xc, axis=-1) * x.shape[-1]
    return CArray(jnp.real(y).astype(jnp.float32), jnp.imag(y).astype(jnp.float32))


FFT_IMPLS: dict[str, Callable[[CArray], CArray]] = {
    "xla": fft_xla,
    "matmul": fft_matmul,
    "four_step": fft_four_step,
}

IFFT_IMPLS: dict[str, Callable[[CArray], CArray]] = {
    "xla": ifft_xla,
    "matmul": ifft_matmul,
    "four_step": ifft_four_step,
}


def get_fft(impl: str = "four_step") -> Callable[[CArray], CArray]:
    return FFT_IMPLS[impl]


def get_ifft(impl: str = "four_step") -> Callable[[CArray], CArray]:
    return IFFT_IMPLS[impl]


def default_impl() -> str:
    """Pick the FFT implementation for the current default backend: planar
    MXU paths on TPU (no complex dtype there), XLA's native FFT elsewhere."""
    platform = jax.default_backend()
    return "four_step" if platform not in ("cpu", "gpu") else "xla"
