"""Pallas TPU kernel: fused four-step FFT + MRC demodulation.

The XLA pipeline materializes the FFT'd frame (yf, [S, A, F] planar = twice
the input footprint) in HBM between the FFT matmuls and the MRC reduce.
This kernel fuses the whole data path per symbol-tile -- DFT stage 1,
twiddle, DFT stage 2, channel multiply, antenna reduce, normalize -- so yf
lives only in VMEM.  It is the TPU-native analogue of the reference's fused
frame path (demodOptimized, gpuLS.cu:677-769), which chains cuFFT + three
kernels through global memory; here it is ONE kernel and the hot intermediate
never leaves the chip.

Layout strategy (all shaped around Mosaic's constraint that the last two
vector dims are the tiled ones and cannot be split/merged in-kernel):

* Inputs arrive pre-shaped [S, A, n1, n2] (a free row-major reshape of
  [S, A, F] done by XLA outside) so the kernel only ever merges/splits
  LEADING dims, which is layout-neutral.
* With n = N2*i1 + i2 and k = N1*k2 + k1, the four-step output naturally
  lands in [k1, k2] order.  The kernel keeps that permuted order end-to-end:
  the channel estimate / normalizer are pre-permuted once per frame (static
  gather), and the inverse permutation is folded into the pipeline-edge
  gather that already does the DC-drop + ifftshift.  Zero transposes.

All math is planar float32 (no complex dtype on TPU); the two DFT stages are
dot_generals contracting a 32-wide dim on the MXU with fp32 accumulation.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cplx import CArray
from .fft import _dft_matrix, _split, _twiddle

_DIMS = (((1,), (0,)), ((), ()))  # contract lhs dim 1 with rhs dim 0


@functools.lru_cache(maxsize=None)
def _perm_tables(f: int) -> Tuple[np.ndarray, np.ndarray]:
    """(perm, inv_perm) between true-frequency order and kernel [k1,k2] order.

    kernel position f' = k1*N2 + k2 holds true frequency k = N1*k2 + k1.
    perm[f'] = k (gather true->kernel); inv_perm[k] = f' (gather kernel->true).
    """
    n1, n2 = _split(f)
    k1 = np.arange(n1)[:, None]
    k2 = np.arange(n2)[None, :]
    perm = (n1 * k2 + k1).reshape(-1)          # [f'] -> k
    inv = np.empty(f, dtype=np.int32)
    inv[perm] = np.arange(f, dtype=np.int32)
    return perm.astype(np.int32), inv


def _fused_kernel(yre_ref, yim_ref, hre_ref, him_ref, hsqinv_ref,
                  d1re_ref, d1im_ref, twre_ref, twim_ref, d2re_ref, d2im_ref,
                  outre_ref, outim_ref, *, ts: int, a: int, ac: int,
                  n1: int, n2: int):
    """Per-tile body: antennas processed in chunks of ``ac`` to bound the
    fp32-HIGHEST dot temporaries (Mosaic supports only DEFAULT/HIGHEST, and
    HIGHEST expands every operand into multiple scoped-VMEM passes)."""

    def dg(l, r):
        return lax.dot_general(l, r, dimension_numbers=_DIMS,
                               precision=lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)

    d1re, d1im = d1re_ref[:], d1im_ref[:]
    twre, twim = twre_ref[:], twim_ref[:]
    d2re, d2im = d2re_ref[:], d2im_ref[:]

    def chunk(ai, carry):
        num_re, num_im = carry
        b = ts * ac
        # Leading-dim slice + merge only; tiled (n1, n2) dims untouched.
        xre = yre_ref[:, pl.ds(ai * ac, ac)].reshape(b, n1, n2)
        xim = yim_ref[:, pl.ds(ai * ac, ac)].reshape(b, n1, n2)

        # Stage 1: contract i1 -> [b, i2, k1]
        are = dg(xre, d1re) - dg(xim, d1im)
        aim = dg(xre, d1im) + dg(xim, d1re)
        # Twiddle (stored transposed [i2, k1] to match the layout).
        bre = are * twre - aim * twim
        bim = are * twim + aim * twre
        # Stage 2: contract i2 -> [b, k1, k2] == permuted frequency tiling.
        yfre = (dg(bre, d2re) - dg(bim, d2im)).reshape(ts, ac, n1, n2)
        yfim = (dg(bre, d2im) + dg(bim, d2re)).reshape(ts, ac, n1, n2)

        hre = hre_ref[pl.ds(ai * ac, ac)][None]
        him = him_ref[pl.ds(ai * ac, ac)][None]
        num_re = num_re + jnp.sum(yfre * hre - yfim * him, axis=1)
        num_im = num_im + jnp.sum(yfre * him + yfim * hre, axis=1)
        return num_re, num_im

    zero = jnp.zeros((ts, n1, n2), jnp.float32)
    num_re, num_im = lax.fori_loop(0, a // ac, chunk, (zero, zero))
    inv = hsqinv_ref[:][None]
    outre_ref[:] = num_re * inv
    outim_ref[:] = num_im * inv


def _choose_tiles(a: int, f: int) -> Tuple[int, int]:
    """(ts, ac): symbol tile x antenna chunk, sized so the fp32-HIGHEST dot
    temporaries stay inside the 16 MB scoped-VMEM limit.  Mosaic's HIGHEST
    dot expands each operand into multiple split-precision passes with a
    super-linear VMEM footprint (measured on v5e at f=1024: ts*ac = 128
    demands 42 MB, ts*ac = 16 still OOMs, ts=2 x ac=4 compiles), so the
    chunk is capped at ts*ac*f <= 8192 elements, shrinking the symbol tile
    FIRST (the measured-safe shape at 16 ant x 1024 is ts=2 x ac=4; the
    ac-first alternative ts=8 x ac=1 OOMs on hardware).  ac is always a
    divisor of a so no antenna is dropped from the chunk loop."""
    ac = a
    while ac > 4 or (a % ac):
        ac -= 1
    ts = 8
    while ts > 1 and ts * ac * f > 8 * 1024:
        ts //= 2
    while ac > 1 and ts * ac * f > 8 * 1024:
        ac = next(d for d in range(ac - 1, 0, -1) if a % d == 0)
    # When the antenna count forces ac below 4, the product cap alone would
    # admit shapes like ts=8 x ac=1 at f=1024 -- which OOMs the scoped VMEM
    # on hardware (the HIGHEST-dot expansion scales with ts, not just the
    # product).  Hold ts <= 2*ac, mirroring the measured-safe ts=2 x ac=4.
    while ts > 1 and ts > 2 * ac:
        ts //= 2
    return ts, ac


def fused_demod(y: CArray, hconj: CArray, hsqrd: jnp.ndarray,
                interpret: bool = False,
                tiles: Tuple[int, int] | None = None) -> CArray:
    """Fused FFT+MRC over a data block.

    Args:
      y:     [S, A, F] planar time-domain data symbols (CP already dropped).
      hconj: [A, F] planar conjugated channel estimate (true frequency order,
             DC bin zeroed -- ls.estimate_channel_full output).
      hsqrd: [F] float32 MRC normalizer (true order, DC pinned to 1).

    Returns:
      [S, F] planar equalized subcarriers in TRUE frequency order (DC bin
      meaningless, as in mrc_combine) -- feed to mrc.finalize.
    """
    s, a, f = y.shape
    n1, n2 = _split(f)
    if n2 == 1:
        raise ValueError(f"fft size {f} not factorable for the fused kernel")
    perm, inv = _perm_tables(f)
    perm_j = jnp.asarray(perm)
    inv_j = jnp.asarray(inv)

    ts, ac = tiles if tiles is not None else _choose_tiles(a, f)
    if a % ac:
        raise ValueError(f"antenna chunk {ac} does not divide {a} antennas")
    s_pad = ((s + ts - 1) // ts) * ts
    yre, yim = y.re, y.im
    if s_pad != s:
        pad = [(0, s_pad - s), (0, 0), (0, 0)]
        yre, yim = jnp.pad(yre, pad), jnp.pad(yim, pad)
    # Free row-major reshapes outside the kernel.
    yre = yre.reshape(s_pad, a, n1, n2)
    yim = yim.reshape(s_pad, a, n1, n2)

    # Pre-permute the estimate into kernel order (one static gather).
    h_re = hconj.re[:, perm_j].reshape(a, n1, n2)
    h_im = hconj.im[:, perm_j].reshape(a, n1, n2)
    hsqinv = (1.0 / hsqrd)[perm_j].reshape(n1, n2)

    d1 = _dft_matrix(n1, -1.0)
    d2 = _dft_matrix(n2, -1.0)
    tw = _twiddle(n1, n2, -1.0).T  # [i2, k1] to match the stage-1 layout
    consts = [jnp.asarray(np.ascontiguousarray(m), jnp.float32)
              for m in (d1.real, d1.imag, tw.real, tw.imag, d2.real, d2.imag)]

    grid = (s_pad // ts,)
    kernel = functools.partial(_fused_kernel, ts=ts, a=a, ac=ac, n1=n1, n2=n2)

    block_y = pl.BlockSpec((ts, a, n1, n2), lambda i: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    out_re, out_im = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[block_y, block_y,
                  full((a, n1, n2)), full((a, n1, n2)), full((n1, n2)),
                  full((n1, n1)), full((n1, n1)),
                  full((n2, n1)), full((n2, n1)),
                  full((n2, n2)), full((n2, n2))],
        out_specs=(pl.BlockSpec((ts, n1, n2), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((ts, n1, n2), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((s_pad, n1, n2), jnp.float32),
                   jax.ShapeDtypeStruct((s_pad, n1, n2), jnp.float32)),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=8 * s_pad * a * f * (n1 + n2) + 8 * s_pad * a * f,
            bytes_accessed=(2 * s_pad * a * f + 2 * s_pad * f + 2 * a * f) * 4,
            transcendentals=0,
        ),
    )(yre, yim, h_re, h_im, hsqinv, *consts)

    # Back to true frequency order: kernel position f' holds true frequency
    # perm[f'], so true[k] sits at kernel position inv[k].  (Callers fold
    # this gather with finalize's DC-drop + ifftshift edge gather.)
    out_re = out_re.reshape(s_pad, f)[:s, inv_j]
    out_im = out_im.reshape(s_pad, f)[:s, inv_j]
    return CArray(out_re, out_im)
