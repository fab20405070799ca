"""Maximal Ratio Combining demodulation on full-width planar tensors.

Math per reference ``matrixMultThenSum`` + normalize (cpuLS.hpp:187-208,
354-367) / ``multiplyWithChannelConj`` + ``combineForMRC``
(gpuLS.cu:212-259): Yf[k] = sum_ant FFT(Y)_ant[k] * Hconj_ant[k] / Hsqrd[k].

The antenna reduction is the framework's cross-chip collective axis: under
``shard_map`` the partial numerator and |H|^2 are psum-ed over the ``ant``
mesh axis (parallel/sharded.py); this module is the purely local math.
"""

from __future__ import annotations

import jax.numpy as jnp

from .cplx import CArray
from .shift import output_shift


def mrc_numerator(data_fft: CArray, hconj_full: CArray) -> CArray:
    """Per-shard MRC numerator: sum over (local) antennas of Yf * Hconj.

    Args:
      data_fft:   [S, A, F] planar FFT'd data symbols.
      hconj_full: [A, F] planar conjugated channel estimate (DC-masked).

    Returns:
      [S, F] planar partial numerator.
    """
    hr, hi = hconj_full.re[None], hconj_full.im[None]
    re = jnp.sum(data_fft.re * hr - data_fft.im * hi, axis=1)
    im = jnp.sum(data_fft.re * hi + data_fft.im * hr, axis=1)
    return CArray(re, im)


def mrc_combine(data_fft: CArray, hconj_full: CArray,
                hsqrd_full: jnp.ndarray) -> CArray:
    """Full local MRC: numerator reduce over antennas, then normalize.

    Returns [S, F] planar equalized subcarriers on the full grid.
    """
    num = mrc_numerator(data_fft, hconj_full)
    return num.div_real(hsqrd_full[None, :])


def finalize(equalized_full: CArray) -> CArray:
    """Edge conversion from full grid to the reference's (F-1)-wide output:
    drop the DC bin, then apply the output half-spectrum swap
    (shiftOneRow, cpuLS.hpp:368)."""
    return output_shift(equalized_full[..., 1:])
