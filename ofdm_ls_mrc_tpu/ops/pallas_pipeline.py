"""Whole-pipeline Pallas kernel: FFT + MRC per symbol tile, VMEM-resident.

Why this exists: at fp32-accurate (HIGH) matmul precision the XLA fast path
(ops/fastpath.py) is HBM-bound -- each Karatsuba GEMM pass of the FFT's
second stage round-trips a ~13 MB [rows, 128] operand through HBM, and the
FFT'd frame is materialized again before the MRC reduce.  Measured on v5e:
~88 us/frame for 16 ant x 1024 FFT x 101 symbols, of which ~55 us is stage-2
traffic.  This kernel streams [ts, A, F] symbol tiles through VMEM and does
stage-1 butterflies, twiddle, stage-2 GEMMs, channel multiply, antenna
reduction and normalization before anything returns to HBM: traffic drops to
the input read + a [ts, F] output write (~15 MB/frame total).

It is the TPU-native analogue of the reference's fused frame path
(demodOptimized, gpuLS.cu:677-769) -- cuFFT + three global-memory kernels
there, ONE VMEM-resident kernel here.

Numerics: Mosaic's fp32 dot (HIGHEST) expands operands so aggressively that
real tile sizes blow the 16 MB scoped-VMEM limit (see ops/pallas_mrc.py),
so the stage-2 GEMMs use a manual bf16 split -- x ~ hi(x) + lo(x), each
bf16, with the hi*hi + lo*hi + hi*lo cross products accumulated in fp32 on
the MXU (the same scheme as XLA's Precision.HIGH, under our control).
Because the MXU is dispatch-bound at these shapes, the four real products
of the complex GEMM share ONE [4M, n2] x [n2, 2*n2] dot against the
lane-concatenated [Wr | Wi] matrix plus one [2M, n2] lo-correction dot --
2 dots per symbol instead of Karatsuba's 9 (measured: 44 us -> ~15 us of
stage-2 time per 100-symbol frame); the shipped schedule ("g2", r2 probe
study in docs/PERF.md) further batches the dots of TWO symbols per
dispatch, cutting dispatches to 52/frame -- equal to per-symbol dots at
exact precision (MAC-floor bound) and ~8-11% faster in the bf16 speed
mode.  End-to-end error vs the NumPy golden: ~4e-6 relative (fp32-grade;
the exact=False speed mode drops the lo correction: ~1e-2 rel err,
~33 Gs/s).

Layout (fastpath order, n1 = F/128, n2 = 128): input [S, A, n1, n2] is a
free host-side reshape; within the kernel only leading dims are merged or
split, so the tiled (sublane, lane) = (n1-multiple, 128) layout never
changes.  The kernel's output stays in the fastpath's permuted frequency
order ([k1, k2], true frequency n1*k2 + k1); the caller folds the inverse
permutation into the DC-drop + ifftshift edge gather exactly as
fastpath.demod_frame_fast does.

Stage 1 (the n1-point DFT along k1) is done on the VPU as an unrolled
radix-2 butterfly network -- an 8-point DFT is 20 complex add/subs plus two
sqrt(2)/2 twiddles, far cheaper than an 8-deep MXU contraction that would
use 6% of the systolic array.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cplx import CArray
from .fastpath import _fast_split
from .fft import _twiddle


def _split_bf16_const(m: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side two-term bf16 split of an fp32 constant matrix."""
    import ml_dtypes
    hi = m.astype(ml_dtypes.bfloat16)
    lo = (m.astype(np.float32) - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return hi, lo


@functools.lru_cache(maxsize=None)
def _stage2_consts(n2: int):
    """bf16 hi/lo splits of the lane-concatenated [Wr | Wi] DFT matrix.

    One [n2, 2*n2] RHS serves all four real products of the complex GEMM
    (see _stage2_dots): fewer, bigger MXU dispatches beat the Karatsuba
    3-GEMM scheme inside the kernel, where dot count -- not FLOPs -- is the
    bottleneck (117 [1024,128]x[128,128] dots measured 44 us/frame; 26
    [4096,128]x[128,256] dots measured far faster)."""
    k = np.arange(n2)
    ang = -2.0 * np.pi * np.outer(k, k) / n2
    wcat = np.concatenate([np.cos(ang), np.sin(ang)], axis=1).astype(np.float32)
    return _split_bf16_const(wcat)      # (wcat_hi, wcat_lo), each [n2, 2*n2]


@functools.lru_cache(maxsize=None)
def _stage1_consts(a: int, n1: int):
    """Stage-1-on-MXU constants: the n1-point DFT as a block-diagonal
    [2*a*n1, a*n1] real matrix pair (bf16 hi/lo splits).

    Rows [Mr; Mi] where M = I_A (x) D and D[r, s] = W_n1^{rev(r)*s} --
    rows in BIT-REVERSED k1 order so the dot's output matches the VPU
    butterfly network's layout exactly.  The block-diagonal embedding
    wastes (a*n1)/n1 = a of the MACs on structural zeros, but in the bf16
    speed mode the MXU idles ~12 us/frame while the VPU butterfly chain
    binds (probe 6, docs/PERF.md) -- trading idle MXU MACs for the whole
    stage-1 VPU chain is the point (VERDICT r4 item 2)."""
    rev = _bitrev(n1)
    d = np.exp(-2j * np.pi * np.outer(rev, np.arange(n1)) / n1)
    m = np.kron(np.eye(a), d)                       # [a*n1, a*n1]
    mcat = np.concatenate([m.real, m.imag], axis=0).astype(np.float32)
    return _split_bf16_const(mcat)                  # each [2*a*n1, a*n1]


@functools.lru_cache(maxsize=None)
def _bitrev(n1: int) -> np.ndarray:
    """Bit-reversal permutation for a power-of-2 n1 (involution)."""
    bits = n1.bit_length() - 1
    out = np.zeros(n1, dtype=np.int64)
    for i in range(n1):
        v, x = 0, i
        for _ in range(bits):
            v = (v << 1) | (x & 1)
            x >>= 1
        out[i] = v
    return out


_BITREV8 = _bitrev(8)  # kept by name: [0, 4, 2, 6, 1, 5, 3, 7]


@functools.lru_cache(maxsize=None)
def _dif_consts(n1: int):
    """Per-sublane planar constants for the log2(n1) DIF radix-2 stages.

    At the stage with butterfly span m (groups of 2m), the subtract (lower)
    half of each group multiplies by W_{2m}^{s mod m}; the add half by 1.
    The final span-1 stage is twiddle-free and omitted.  Returned as
    [n1]-long (cr, ci) float32 pairs per twiddled stage.
    """
    out = []
    m = n1 // 2
    while m >= 2:
        c = np.ones(n1, np.complex64)
        for s in range(n1):
            if s % (2 * m) >= m:
                c[s] = np.exp(-2j * np.pi * (s % m) / (2 * m))
        out.append((c.real.astype(np.float32), c.imag.astype(np.float32)))
        m //= 2
    return tuple(out)


def _dif_stage(xr, xi, span, n1, mask, cr, ci):
    """One DIF radix-2 butterfly stage: circular sublane roll + masked select
    + per-sublane constant complex multiply (cr=None for the twiddle-free
    span-1 stage)."""
    rr = pltpu.roll(xr, span, 1)        # rr[s] = xr[(s - span) mod n1]
    ri = pltpu.roll(xi, span, 1)
    if 2 * span == n1:
        fr, fi = rr, ri                 # roll(span) == roll(n1 - span)
    else:
        fr = pltpu.roll(xr, n1 - span, 1)   # fr[s] = xr[(s + span) mod n1]
        fi = pltpu.roll(xi, n1 - span, 1)
    ur = jnp.where(mask, xr + fr, rr - xr)
    ui = jnp.where(mask, xi + fi, ri - xi)
    if cr is None:
        return ur, ui
    return ur * cr - ui * ci, ur * ci + ui * cr


def _dif_sublane(xr, xi, r, n1, n2, stage_consts):
    """DIF radix-2 n1-point DFT along the sublane axis of [R, n1, n2] planes.

    Whole-tensor formulation: each butterfly stage is a circular sublane roll
    plus a masked select plus a per-sublane constant complex multiply -- no
    slicing, no concatenation, no layout changes.  Output frequency index is
    BIT-REVERSED (k at sublane rev(k)); callers fold the reversal into the
    frequency-permutation tables.  ``stage_consts`` are (cr, ci) [1, n1, n2]
    kernel inputs (per-sublane constants broadcast over lanes), one pair per
    twiddled stage (all but the last).
    """
    sub = jax.lax.broadcasted_iota(jnp.int32, (r, n1, n2), 1)

    m = n1 // 2
    ci = 0
    while m >= 1:
        mask = sub % (2 * m) < m
        cr_ci = stage_consts[ci] if m >= 2 else (None, None)
        xr, xi = _dif_stage(xr, xi, m, n1, mask, *cr_ci)
        m //= 2
        ci += 1
    return xr, xi


def _split_bf16(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _stage2_dots(bre, bim, wcat_hi, wcat_lo, n2: int, exact: bool = True):
    """Complex GEMM against the DFT matrix as TWO large MXU dots.

    All four real products (xr|xi x Wr|Wi) ride one [4M, n2] x [n2, 2*n2]
    dot of bf16 hi/lo splits, with the lo-side correction as a second
    [2M, n2] dot -- the hi*hi + lo*hi + hi*lo expansion that makes the
    result fp32-grade (same scheme as XLA's Precision.HIGH).  With
    ``exact=False`` only the hi*hi products run (plain-bf16 numerics, ~1e-2
    relative error, half the MACs -- the DEFAULT-precision speed mode)."""
    d = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    m = bre.shape[0]
    rhi, rlo = _split_bf16(bre)
    ihi, ilo = _split_bf16(bim)
    if not exact:
        p = d(jnp.concatenate([rhi, ihi], axis=0), wcat_hi)
        xrwr, xrwi = p[:m, :n2], p[:m, n2:]
        xiwr, xiwi = p[m:, :n2], p[m:, n2:]
        return xrwr - xiwi, xrwi + xiwr
    # hi rows lead so the lo-correction dot reuses a SLICE of the same
    # operand instead of a second concatenation.
    lhs4 = jnp.concatenate([rhi, ihi, rlo, ilo], axis=0)
    p = d(lhs4, wcat_hi)
    q = d(lhs4[:2 * m], wcat_lo)
    xrwr = p[:m, :n2] + p[2 * m:3 * m, :n2] + q[:m, :n2]
    xrwi = p[:m, n2:] + p[2 * m:3 * m, n2:] + q[:m, n2:]
    xiwr = p[m:2 * m, :n2] + p[3 * m:, :n2] + q[m:, :n2]
    xiwi = p[m:2 * m, n2:] + p[3 * m:, n2:] + q[m:, n2:]
    return xrwr - xiwi, xrwi + xiwr


def _pilot_kernel(pre_ref, pim_ref, xre_ref, xim_ref, den_ref,
                  twre_ref, twim_ref, *rest, a: int, n1: int, n2: int,
                  exact: bool = True):
    """One-dispatch pilot LS estimate in KERNEL (bitrev-k1) layout.

    The XLA pilot path (fft_permuted + ls_permuted + the h/|h|^2 bitrev
    gathers inside fused_pipeline) costs ~10 small device ops per frame
    whose time is dominated by dispatch gaps, not math (r5 trace:
    ~10.5 us of glue around a 24-25 us kernel).  This kernel computes the
    same estimate -- stage-1 butterflies + twiddle + bf16-split stage-2
    dots + the LS divide + |h|^2 reduce -- in ONE dispatch, and emits h
    directly in the data kernel's own bitrev layout so the per-frame
    reorder gathers disappear too.  Replaces the separate pilot program
    of the reference's firstVector (gpuLS.cu:351-408) with one fused
    dispatch.
    """
    n_tw_stages = max(n1.bit_length() - 2, 0)
    stage_refs = rest[:2 * n_tw_stages]
    wch_ref, wcl_ref, hre_ref, him_ref, inv_ref = rest[2 * n_tw_stages:]
    consts = [(stage_refs[2 * i][:][None], stage_refs[2 * i + 1][:][None])
              for i in range(n_tw_stages)]
    twre, twim = twre_ref[:][None], twim_ref[:][None]

    xr = pre_ref[:].astype(jnp.float32)
    xi = pim_ref[:].astype(jnp.float32)
    ar, ai = _dif_sublane(xr, xi, a, n1, n2, consts)
    bre = (ar * twre - ai * twim).reshape(a * n1, n2)
    bim = (ar * twim + ai * twre).reshape(a * n1, n2)
    c2re, c2im = _stage2_dots(bre, bim, wch_ref[:], wcl_ref[:], n2,
                              exact=exact)
    pr = c2re.reshape(a, n1, n2)
    pi = c2im.reshape(a, n1, n2)
    xre = xre_ref[:][None]            # pilot reference, kernel order
    xim = xim_ref[:][None]
    den = den_ref[:][None]            # 1/|x|^2
    h_r = (pr * xre + pi * xim) * den
    h_i = (pi * xre - pr * xim) * den
    hre_ref[:] = h_r
    him_ref[:] = h_i
    inv_ref[:] = 1.0 / jnp.sum(h_r * h_r + h_i * h_i, axis=0)


def estimate_pilot_fused(pilot: CArray, x_full_perm: CArray, *,
                         interpret=None, exact: bool = True):
    """Pilot symbol [A, F] (or [A, n1, n2]; f32 or sc16 int16 planes) ->
    (h [A, n1, n2], 1/sum|h|^2 [n1, n2]) in KERNEL bitrev layout, one
    pallas dispatch.  Feed the outputs straight to fused_pipeline (3-D h
    skips its reorder gathers)."""
    interpret = _resolve_interpret(interpret)
    if pilot.re.ndim == 3:
        a, n1, n2 = pilot.shape
        f = n1 * n2
        if (n1, n2) != _fast_split(f):
            raise ValueError(f"3D pilot split ({n1}, {n2}) != fast split "
                             f"{_fast_split(f)}")
    else:
        a, f = pilot.shape
        n1, n2 = _fast_split(f)
    if not supports_fused(f):
        raise ValueError(f"estimate_pilot_fused requires a (2^k, 128) "
                         f"split, got F={f}")
    pre = pilot.re.reshape(a, n1, n2)
    pim = pilot.im.reshape(a, n1, n2)

    br = _bitrev(n1)
    xk_re = x_full_perm.re.reshape(n1, n2)[br, :]
    xk_im = x_full_perm.im.reshape(n1, n2)[br, :]
    den = 1.0 / (xk_re * xk_re + xk_im * xk_im)

    tw = _twiddle(n1, n2, -1.0)[br]
    if jnp.issubdtype(pre.dtype, jnp.integer):
        from ..golden.io import SC16_FULL_SCALE
        tw = tw / SC16_FULL_SCALE
    twre = jnp.asarray(np.ascontiguousarray(tw.real), jnp.float32)
    twim = jnp.asarray(np.ascontiguousarray(tw.imag), jnp.float32)
    stage_tw = [jnp.asarray(np.broadcast_to(c[:, None], (n1, n2)).copy())
                for pair in _dif_consts(n1) for c in pair]
    consts = [jnp.asarray(np.asarray(c)) for c in _stage2_consts(n2)]

    kernel = functools.partial(_pilot_kernel, a=a, n1=n1, n2=n2, exact=exact)
    full = lambda shape: pl.BlockSpec(shape, lambda: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    hre, him, inv = pl.pallas_call(
        kernel,
        in_specs=[full((a, n1, n2)), full((a, n1, n2)),
                  full((n1, n2)), full((n1, n2)), full((n1, n2)),
                  full((n1, n2)), full((n1, n2)),
                  *(full((n1, n2)) for _ in range(len(stage_tw))),
                  full((n2, 2 * n2)), full((n2, 2 * n2))],
        out_specs=(full((a, n1, n2)), full((a, n1, n2)), full((n1, n2))),
        out_shape=(jax.ShapeDtypeStruct((a, n1, n2), jnp.float32),
                   jax.ShapeDtypeStruct((a, n1, n2), jnp.float32),
                   jax.ShapeDtypeStruct((n1, n2), jnp.float32)),
        interpret=interpret,
    )(pre, pim, xk_re, xk_im, den, twre, twim, *stage_tw, *consts)
    return CArray(hre, him), inv


def _kernel(yre_ref, yim_ref, hre_ref, him_ref, hsqinv_ref,
            twre_ref, twim_ref, *rest, ts: int, a: int, n1: int, n2: int,
            exact: bool = True, schedule: str = "block",
            fuse_est: bool = False):
    """Per-symbol software interleave in straight-line code: stage 1 (VPU
    butterflies + twiddle) of symbol k+1 is issued BEFORE stage 2 + MRC
    (MXU dots + reduce) of symbol k.  The chains are data-independent, so
    Mosaic's scheduler overlaps vector and matrix work (~8% end-to-end;
    predicated @pl.when pipelining across grid steps measured slower --
    docs/PERF.md).

    ``schedule`` selects the experimental issue order (docs/PERF.md r2):
      block   -- shipped: whole stage1(k+1) emitted before stage2+MRC(k)
      fine    -- statement-level interleave: butterfly stages of k+1 emitted
                 BETWEEN the MXU dots of k
      s1only  -- probe: VPU chain only (butterflies+twiddle+reduce)
      s2only  -- probe: MXU chain only (dots+MAC on raw input)
    """
    n_tw_stages = max(n1.bit_length() - 2, 0)   # all radix-2 stages but span-1
    stage_refs = rest[:2 * n_tw_stages]
    # gNx[f]: stage-1 rides the MXU as a block-diagonal DFT dot (two extra
    # constant inputs follow wcl) -- see _stage1_consts / stage1_group_mxu.
    s1x = schedule.startswith("g") and "x" in schedule[1:]
    if s1x:
        if fuse_est:
            raise NotImplementedError("stage-1-on-MXU (gNx) does not "
                                      "compose with fuse_estimate")
        (wch_ref, wcl_ref, mh_ref, ml_ref,
         outre_ref, outim_ref) = rest[2 * n_tw_stages:]
    elif fuse_est:
        # In-kernel channel estimation (r3): the h inputs are replaced by
        # the pilot reference (xre, xim, 1/|x|^2, kernel order) and h lives
        # in VMEM scratch, written once at grid step 0 from the pilot row's
        # own stage-2 output -- the kernel FFTs row 0 anyway, so the whole
        # XLA-side pilot path (fft_permuted + LS divide + |h|^2 reduce +
        # their dispatch overhead) disappears from the program.
        (wch_ref, wcl_ref, outre_ref, outim_ref,
         hre_s, him_s, inv_s) = rest[2 * n_tw_stages:]
    else:
        wch_ref, wcl_ref, outre_ref, outim_ref = rest[2 * n_tw_stages:]
    consts = [(stage_refs[2 * i][:][None], stage_refs[2 * i + 1][:][None])
              for i in range(n_tw_stages)]
    twre, twim = twre_ref[:][None], twim_ref[:][None]
    if not fuse_est:
        hre = hre_ref[:][None]
        him = him_ref[:][None]
        inv = hsqinv_ref[:][None]

    if yre_ref.dtype == jnp.float32:
        def load(lo):
            return (yre_ref[lo:lo + 1].reshape(a, n1, n2),
                    yim_ref[lo:lo + 1].reshape(a, n1, n2))
    else:
        # int16/bf16 inputs (half the HBM->VMEM bytes): ONE whole-tile
        # widening convert per grid step -- per-symbol slice-converts of
        # int16 refs sent Mosaic's compile time through the roof -- with
        # the sample scale folded into the (linear) twiddle constants.
        yre_all = yre_ref[:].astype(jnp.float32)
        yim_all = yim_ref[:].astype(jnp.float32)

        def load(lo):
            return (yre_all[lo:lo + 1].reshape(a, n1, n2),
                    yim_all[lo:lo + 1].reshape(a, n1, n2))

    def s1_finish(ar, ai):
        return ((ar * twre - ai * twim).reshape(a * n1, n2),
                (ar * twim + ai * twre).reshape(a * n1, n2))

    def stage1(lo):
        # n1-point DFT over the sublane dim (whole-tensor rolls) + twiddle;
        # output [a*n1, n2] rows in bit-reversed k1 order.
        xr, xi = load(lo)
        ar, ai = _dif_sublane(xr, xi, a, n1, n2, consts)
        return s1_finish(ar, ai)

    def estimate_from(c2re, c2im):
        """Write (h, 1/sum|h|^2) scratch from the pilot row's stage-2 output
        (grid step 0 only; rows of the SAME tile read it right after in
        program order, later steps read the persisted scratch)."""
        @pl.when(pl.program_id(0) == 0)
        def _():
            pr = c2re.reshape(a, n1, n2)
            pi = c2im.reshape(a, n1, n2)
            xre = hre_ref[:][None]       # pilot reference, kernel order
            xim = him_ref[:][None]
            den = hsqinv_ref[:][None]    # 1/|x|^2
            h_r = (pr * xre + pi * xim) * den
            h_i = (pi * xre - pr * xim) * den
            hre_s[:] = h_r
            him_s[:] = h_i
            inv_s[:] = 1.0 / jnp.sum(h_r * h_r + h_i * h_i, axis=0)

    def mrc_write(c2re, c2im, lo):
        cre = c2re.reshape(1, a, n1, n2)
        cim = c2im.reshape(1, a, n1, n2)
        if fuse_est:
            h_re = hre_s[:][None]
            h_im = him_s[:][None]
            h_inv = inv_s[:][None]
        else:
            h_re, h_im, h_inv = hre, him, inv
        num_re = jnp.sum(cre * h_re + cim * h_im, axis=1)
        num_im = jnp.sum(cim * h_re - cre * h_im, axis=1)
        outre_ref[lo:lo + 1] = num_re * h_inv
        outim_ref[lo:lo + 1] = num_im * h_inv

    def stage2_mrc(b, lo):
        bre, bim = b
        c2re, c2im = _stage2_dots(bre, bim, wch_ref[:], wcl_ref[:], n2,
                                  exact=exact)
        mrc_write(c2re, c2im, lo)

    if fuse_est and (schedule in ("io", "io2", "s1only", "s2only", "fine")):
        raise NotImplementedError("fuse_est supports the grouped-dot "
                                  "schedules only")

    if schedule == "io":
        # Probe: input DMA + loads + a minimal reduce + output writes -- the
        # kernel's IO floor with no butterflies and no dots.
        for k in range(ts):
            xr, xi = load(k)
            outre_ref[k:k + 1] = jnp.sum(xr[None], axis=1)
            outim_ref[k:k + 1] = jnp.sum(xi[None], axis=1)
        return
    if schedule == "io2":
        # Probe: same IO floor with ONE whole-tile load and ONE whole-tile
        # write per plane (no per-symbol ref slicing).
        outre_ref[:] = jnp.sum(yre_ref[:].astype(jnp.float32), axis=1)
        outim_ref[:] = jnp.sum(yim_ref[:].astype(jnp.float32), axis=1)
        return
    if schedule == "s1only":
        for k in range(ts):
            bre, bim = stage1(k)
            outre_ref[k:k + 1] = jnp.sum(bre.reshape(1, a, n1, n2), axis=1)
            outim_ref[k:k + 1] = jnp.sum(bim.reshape(1, a, n1, n2), axis=1)
        return
    if schedule == "s2only":
        for k in range(ts):
            xr, xi = load(k)
            stage2_mrc((xr.reshape(a * n1, n2), xi.reshape(a * n1, n2)), k)
        return
    if schedule == "fine":
        # Manual statement-level interleave: emit the butterfly stages of
        # symbol k+1 between the two MXU dots of symbol k, giving Mosaic's
        # list scheduler explicit alternation points in program order.
        d = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
        m = a * n1

        def dots_begin(b):
            bre, bim = b
            rhi, rlo = _split_bf16(bre)
            ihi, ilo = _split_bf16(bim)
            if exact:
                lhs4 = jnp.concatenate([rhi, ihi, rlo, ilo], axis=0)
            else:
                lhs4 = jnp.concatenate([rhi, ihi], axis=0)
            return lhs4

        def dot_hi(lhs4):
            return d(lhs4, wch_ref[:])

        def dot_lo(lhs4):
            if not exact:
                return None
            return d(lhs4[:2 * m], wcl_ref[:])

        def dots_end(p, q, lo):
            if exact:
                xrwr = p[:m, :n2] + p[2 * m:3 * m, :n2] + q[:m, :n2]
                xrwi = p[:m, n2:] + p[2 * m:3 * m, n2:] + q[:m, n2:]
                xiwr = p[m:2 * m, :n2] + p[3 * m:, :n2] + q[m:, :n2]
                xiwi = p[m:2 * m, n2:] + p[3 * m:, n2:] + q[m:, n2:]
            else:
                xrwr, xrwi = p[:m, :n2], p[:m, n2:]
                xiwr, xiwi = p[m:, :n2], p[m:, n2:]
            mrc_write(xrwr - xiwi, xrwi + xiwr, lo)

        def s1_steps(lo):
            """Generator yielding after each butterfly stage of symbol lo."""
            xr, xi = load(lo)
            sub = jax.lax.broadcasted_iota(jnp.int32, (a, n1, n2), 1)
            mdiv = n1 // 2
            ci = 0
            while mdiv >= 1:
                mask = sub % (2 * mdiv) < mdiv
                cr_ci = consts[ci] if mdiv >= 2 else (None, None)
                xr, xi = _dif_stage(xr, xi, mdiv, n1, mask, *cr_ci)
                mdiv //= 2
                ci += 1
                yield None
            yield s1_finish(xr, xi)

        gen = s1_steps(0)
        for _ in range(n_tw_stages + 1):
            next(gen)
        b_prev = next(gen)
        for k in range(1, ts):
            gen = s1_steps(k)
            next(gen)                      # butterfly stage 0 of symbol k
            lhs4 = dots_begin(b_prev)
            p = dot_hi(lhs4)
            next(gen)                      # butterfly stage 1 of symbol k
            q = dot_lo(lhs4)
            for _ in range(n_tw_stages - 1):
                next(gen)                  # remaining stages of symbol k
            dots_end(p, q, k - 1)
            b_prev = next(gen)
        lhs4 = dots_begin(b_prev)
        dots_end(dot_hi(lhs4), dot_lo(lhs4), ts - 1)
        return

    # Generalized grouped-dot schedule: "block" == "g1" (per-symbol dots,
    # the r1 shipped form); "gN" batches the stage-2 dots of N symbols into
    # one [4NM, n2] x [n2, 2n2] MXU dispatch (fewer, bigger dots -- the
    # kernel is dispatch-bound, not MAC-bound, at these shapes); a trailing
    # "f" ("gNf") additionally lane-concatenates [Wch | Wcl] into one
    # [n2, 4n2] RHS so hi products and the lo correction ride ONE dot
    # (+1/3 MACs on the lo rows, half the dispatches).  An "x" ("gNx",
    # "gNxf") moves STAGE 1 onto the MXU too: the whole radix-2 butterfly
    # chain becomes one block-diagonal [2M, M] x [M, 2N*n2] dot per group
    # (plus the unavoidable per-element twiddle on the VPU) -- the bf16
    # speed mode's VPU-chain-bound answer (probe 6; VERDICT r4 item 2).
    g, fuse = 1, False
    if schedule.startswith("g"):
        body = schedule[1:]
        fuse = body.endswith("f")
        if fuse:
            body = body[:-1]
        if body.endswith("x"):
            body = body[:-1]
        g = int(body)
    m = a * n1
    d = functools.partial(jnp.dot, preferred_element_type=jnp.float32)

    def stage2_group(bs, lo):
        gg = len(bs)
        splits = [(_split_bf16(bre), _split_bf16(bim)) for bre, bim in bs]
        rhi = [s[0][0] for s in splits]
        ihi = [s[1][0] for s in splits]
        if exact:
            rlo = [s[0][1] for s in splits]
            ilo = [s[1][1] for s in splits]
            lhs = jnp.concatenate(rhi + ihi + rlo + ilo, axis=0)
        else:
            lhs = jnp.concatenate(rhi + ihi, axis=0)
        if fuse and exact:
            rhs = jnp.concatenate([wch_ref[:], wcl_ref[:]], axis=1)
            p = d(lhs, rhs)
            qr = lambda r: p[r * m:(r + 1) * m, 2 * n2:3 * n2]
            qi = lambda r: p[r * m:(r + 1) * m, 3 * n2:]
        else:
            p = d(lhs, wch_ref[:])
            if exact:
                q = d(lhs[:2 * gg * m], wcl_ref[:])
                qr = lambda r: q[r * m:(r + 1) * m, :n2]
                qi = lambda r: q[r * m:(r + 1) * m, n2:2 * n2]
        pr = lambda r: p[r * m:(r + 1) * m, :n2]
        pi = lambda r: p[r * m:(r + 1) * m, n2:2 * n2]
        for j in range(gg):
            hr, hi_ = j, gg + j
            if exact:
                lr, li = 2 * gg + j, 3 * gg + j
                xrwr = pr(hr) + pr(lr) + qr(hr)
                xrwi = pi(hr) + pi(lr) + qi(hr)
                xiwr = pr(hi_) + pr(li) + qr(hi_)
                xiwi = pi(hi_) + pi(li) + qi(hi_)
            else:
                xrwr, xrwi = pr(hr), pi(hr)
                xiwr, xiwi = pr(hi_), pi(hi_)
            c2r, c2i = xrwr - xiwi, xrwi + xiwr
            if fuse_est and lo + j == 0:
                estimate_from(c2r, c2i)   # pilot row: refresh h scratch
            mrc_write(c2r, c2i, lo + j)

    if s1x:
        # Stage 1 as ONE MXU dot per group: lhs = [Mr; Mi] block-diagonal
        # DFT constant (bf16 hi/lo), rhs = the group's symbols lane-
        # concatenated [xr0 | xi0 | xr1 | xi1 | ...].  exact mode runs the
        # three-product hi/lo expansion (Mh*Xhi + Mh*Xlo + Ml*Xhi); the
        # bf16 speed mode runs Mh*Xhi alone.  Only the twiddle complex
        # multiply (inherently per-(k1, i2) elementwise) stays on the VPU.
        if yre_ref.dtype == jnp.float32:
            def load_x(lo):
                return (yre_ref[lo:lo + 1].reshape(m, n2),
                        yim_ref[lo:lo + 1].reshape(m, n2))
        elif exact:
            # int16 widens whole-tile like load(); reuse its f32 planes.
            def load_x(lo):
                return (yre_all[lo:lo + 1].reshape(m, n2),
                        yim_all[lo:lo + 1].reshape(m, n2))
        else:
            # bf16 speed mode: int16 -> bf16 DIRECTLY, whole-tile -- the
            # f32 widen never happens (the dot is the first consumer and
            # it takes bf16; the sample scale rides the twiddles).
            yre_b = yre_ref[:].astype(jnp.bfloat16)
            yim_b = yim_ref[:].astype(jnp.bfloat16)

            def load_x(lo):
                return (yre_b[lo:lo + 1].reshape(m, n2),
                        yim_b[lo:lo + 1].reshape(m, n2))

        def stage1_group_mxu(ks):
            xs = [p for k in ks for p in load_x(k)]   # 2*len(ks) [m, n2]
            gg = len(ks)
            if exact:
                his, los = zip(*(_split_bf16(x) for x in xs))
                xcat = jnp.concatenate(list(his) + list(los), axis=1)
                p = d(mh_ref[:], xcat)                # Mh*Xhi | Mh*Xlo
                q = d(ml_ref[:], xcat[:, :2 * gg * n2])   # Ml*Xhi
                s = p[:, :2 * gg * n2] + p[:, 2 * gg * n2:] + q
            else:
                xcat = jnp.concatenate(
                    [x.astype(jnp.bfloat16) for x in xs], axis=1)
                s = d(mh_ref[:], xcat)                # [2m, 2*gg*n2]
            out = []
            for j in range(gg):
                rr = s[:m, 2 * j * n2:(2 * j + 1) * n2]
                ri = s[:m, (2 * j + 1) * n2:(2 * j + 2) * n2]
                ir = s[m:, 2 * j * n2:(2 * j + 1) * n2]
                ii = s[m:, (2 * j + 1) * n2:(2 * j + 2) * n2]
                ar = (rr - ii).reshape(a, n1, n2)
                ai = (ri + ir).reshape(a, n1, n2)
                out.append(s1_finish(ar, ai))         # twiddle (VPU)
            return out

        stage1_fn = stage1_group_mxu
    else:
        stage1_fn = lambda ks: [stage1(k) for k in ks]

    groups = [list(range(i, min(i + g, ts))) for i in range(0, ts, g)]
    b_prev = stage1_fn(groups[0])
    for gi in range(1, len(groups)):
        b_next = stage1_fn(groups[gi])              # next group's stage 1
        stage2_group(b_prev, groups[gi - 1][0])     # MXU chain of previous
        b_prev = b_next
    stage2_group(b_prev, groups[-1][0])


@functools.lru_cache(maxsize=None)
def _kernel_edge_gather(f: int) -> np.ndarray:
    """Edge gather from kernel order to reference order (single-take form).

    Kernel position p = p1*n2 + k2 holds true frequency n1*k2 + rev3(p1)
    (the DIF stage leaves k1 bit-reversed).  The gather folds the inverse of
    that permutation together with the DC drop and the output ifftshift
    (shiftOneRow, cpuLS.hpp:368) into one static take.  Kept as the oracle
    for to_reference_order, which computes the same reordering with
    structured ops (small sublane take + minor transpose + roll) that XLA
    executes ~3x faster than the general gather.
    """
    n1, n2 = _fast_split(f)
    p1 = np.arange(n1)[:, None]
    k2 = np.arange(n2)[None, :]
    true = (n1 * k2 + _bitrev(n1)[p1]).reshape(-1)
    inv = np.empty(f, dtype=np.int64)
    inv[true] = np.arange(f)
    m = f - 1
    j = np.arange(m)
    t = 1 + (j + m // 2) % m
    return inv[t].astype(np.int32)


def to_reference_order(eq: CArray, f: int) -> CArray:
    """[S, F] kernel-order rows -> [S, F-1] reference order, structured form.

    Bit reversal is an involution, so un-reversing k1 is the same 8-row take;
    the four-step inverse permutation is then exactly one [n1, n2] -> [n2, n1]
    minor transpose; DC drop and ifftshift collapse to a slice + roll.
    """
    s = eq.shape[0]
    n1, n2 = _fast_split(f)
    rev = jnp.asarray(_bitrev(n1))

    def fix(p):
        v = p.reshape(s, n1, n2)[:, rev, :]
        v = v.swapaxes(-1, -2).reshape(s, f)     # true natural frequency order
        return jnp.roll(v[:, 1:], -(f // 2 - 1), axis=-1)

    return CArray(fix(eq.re), fix(eq.im))


def fused_frame_shape(s: int, a: int, fft_size: int):
    """The kernel-native frame shape [S, A, n1, n2].

    Placing device arrays in this shape (a free host-side reshape of the
    contiguous [S, A, F] buffer) avoids the operand re-tiling copy; the
    single source of truth for callers (bench, demod_app feed) that
    pre-shape frames."""
    n1, n2 = _fast_split(fft_size)
    return (s, a, n1, n2)


def supports_fused(fft_size: int) -> bool:
    """True when the fused kernel covers this FFT size: the fast split must
    be (2^k, multiple of 128).  Single source of truth for every caller's
    fused-vs-fast routing (UplinkReceiver, ShardedUplinkReceiver, bench)."""
    n1, n2 = _fast_split(fft_size)
    return n1 >= 2 and not (n1 & (n1 - 1)) and n2 % 128 == 0


def warn_fused_fallback(fft_size: int, who: str, to: str = "fast") -> None:
    """Loud downgrade notice: a requested 'fused' pipeline falling back
    costs the flagship kernel's throughput, so the downgrade must never be
    silent (the reference's compile-time config is fail-loud by
    construction, ShMemSymBuff.hpp:41-75).  RuntimeWarning so tests can
    assert it and CLIs surface it on stderr."""
    import warnings
    n1, n2 = _fast_split(fft_size)
    warnings.warn(
        f"{who}: fused pipeline unavailable for fft_size={fft_size} "
        f"(fast split ({n1}, {n2}) is not (power-of-two >= 2, multiple of "
        f"128)); falling back to the slower {to!r} pipeline",
        RuntimeWarning, stacklevel=3)


def _resolve_interpret(interpret) -> bool:
    """None -> interpret on complex-capable CPU backends (tests/golden runs),
    compiled Mosaic elsewhere."""
    if interpret is None:
        return jax.default_backend() == "cpu"
    return interpret


def _auto_ts(a: int, f: int) -> int:
    """Symbol-tile height bounded by scoped VMEM: the kernel's live set
    scales with ts*a*f (measured on v5e: ts=8 at 16 ant x 1024 fits in
    ~11 MB of the 16 MB limit; 64 ant x 1024 at ts=8 demands 22.7 MB)."""
    ts = 8
    while ts > 1 and ts * a * f > 8 * 16 * 1024:
        ts //= 2
    return ts


def fused_pipeline(y: CArray, hre: jnp.ndarray, him: jnp.ndarray,
                   hsqinv: jnp.ndarray, *, ts: int | None = None,
                   interpret=None, exact: bool = True,
                   schedule: str = "g2", fuse_estimate: bool = False) -> CArray:
    """FFT + channel-conjugate MRC over a data block.

    Args:
      y:       [S, A, F] planar time-domain data symbols (CP already gone),
               or pre-shaped [S, A, n1, n2].  Passing the 4D form from a
               device array that was PLACED in that shape skips a whole-frame
               layout re-tiling copy: under TPU tiled layouts the
               [.., F] -> [.., n1, n2] reshape is NOT free (the (8,128) tiles
               of the 3D array interleave antennas), profiled at ~14 us/frame.
      hre/him: [A, F] planar channel estimate h (NOT conjugated; the kernel
               multiplies by conj(h)), in fastpath permuted order
               (fft_permuted output layout).  With ``fuse_estimate`` these
               are instead the [F] PILOT REFERENCE (x.re, x.im, perm order).
      hsqinv:  [F] fp32 1/sum_a|h|^2, fastpath permuted order.  With
               ``fuse_estimate``: 1/|x|^2 instead.
      fuse_estimate: treat row 0 of ``y`` as the PILOT and compute the LS
               channel estimate in-kernel at grid step 0 (h lives in VMEM
               scratch) -- removes the XLA-side pilot path entirely.  Row 0
               of the output is the pilot's self-demod (callers drop it).

    Returns:
      [S, F] planar equalized subcarriers in KERNEL order (bit-reversed k1);
      apply _kernel_edge_gather for reference order.
    """
    interpret = _resolve_interpret(interpret)
    if y.re.ndim == 4:
        s, a, n1, n2 = y.shape
        f = n1 * n2
        if (n1, n2) != _fast_split(f):
            raise ValueError(f"4D input split ({n1}, {n2}) != fast split "
                             f"{_fast_split(f)}")
    else:
        s, a, f = y.shape
        n1, n2 = _fast_split(f)
    if not supports_fused(f):
        raise ValueError(f"fused_pipeline requires a (2^k, 128) split, got "
                         f"({n1}, {n2}) for F={f}")
    if ts is None:
        ts = _auto_ts(a, f)
    if schedule == "fine" and n1 < 4:
        schedule = "block"   # too few butterfly stages to interleave between

    # No host-side padding for ragged symbol counts: the final grid block is
    # handled by pallas itself (out-of-range reads are unspecified-but-safe
    # and out-of-range writes masked; with index clamping the overlap
    # recompute is idempotent).  An explicit jnp.pad materialized the whole
    # ~13 MB operand AND forced a layout copy into the custom call --
    # profiled at ~25 us/frame of pure HBM traffic.
    yre = y.re.reshape(s, a, n1, n2)
    yim = y.im.reshape(s, a, n1, n2)

    # Reorder the channel/normalizer/twiddle rows from natural k1 to the
    # kernel's bit-reversed k1 (tiny one-time gathers outside the kernel).
    # 3-D h ([A, n1, n2] + [n1, n2] hsqinv) is ALREADY in kernel layout
    # (estimate_pilot_fused emits it) and skips the gathers entirely.
    br = _bitrev(n1)
    if fuse_estimate:
        # h inputs carry the [F] pilot reference (x.re, x.im, 1/|x|^2).
        h_re = hre.reshape(n1, n2)[br, :]
        h_im = him.reshape(n1, n2)[br, :]
        hsq = hsqinv.reshape(n1, n2)[br, :]
    elif hre.ndim == 3:
        if hre.shape != (a, n1, n2) or hsqinv.shape != (n1, n2):
            raise ValueError(f"kernel-layout h must be [{a}, {n1}, {n2}] "
                             f"with [{n1}, {n2}] hsqinv; got {hre.shape} / "
                             f"{hsqinv.shape}")
        h_re, h_im, hsq = hre, him, hsqinv
    else:
        h_re = hre.reshape(a, n1, n2)[:, br, :]
        h_im = him.reshape(a, n1, n2)[:, br, :]
        hsq = hsqinv.reshape(n1, n2)[br, :]

    tw = _twiddle(n1, n2, -1.0)[br]  # [k1_br, i2]
    if jnp.issubdtype(yre.dtype, jnp.integer):
        # sc16-native input: samples arrive as int16 (half the input DMA of
        # f32; the exact fidelity of the radio wire format) and the
        # full-scale normalization rides the linear twiddle constants --
        # zero extra VPU work beyond the widening convert.
        from ..golden.io import SC16_FULL_SCALE
        tw = tw / SC16_FULL_SCALE
    twre = jnp.asarray(np.ascontiguousarray(tw.real), jnp.float32)
    twim = jnp.asarray(np.ascontiguousarray(tw.imag), jnp.float32)
    stage_tw = [jnp.asarray(np.broadcast_to(c[:, None], (n1, n2)).copy())
                for pair in _dif_consts(n1) for c in pair]
    consts = [jnp.asarray(np.asarray(c)) for c in _stage2_consts(n2)]

    # gNx schedules append the stage-1 block-diagonal DFT constants.
    s1x = schedule.startswith("g") and "x" in schedule[1:]
    s1_ops, s1_specs = [], []
    if s1x:
        # (The sc16 full-scale factor rides the twiddles, which apply AFTER
        # the stage-1 dot -- nothing extra to fold into M.)
        mh, ml = _stage1_consts(a, n1)
        s1_ops = [jnp.asarray(mh), jnp.asarray(ml)]

    grid = ((s + ts - 1) // ts,)
    kernel = functools.partial(_kernel, ts=ts, a=a, n1=n1, n2=n2, exact=exact,
                               schedule=schedule, fuse_est=fuse_estimate)
    block_y = pl.BlockSpec((ts, a, n1, n2), lambda i: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((ts, n1, n2), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    h_shape = (n1, n2) if fuse_estimate else (a, n1, n2)
    kwargs = {}
    if fuse_estimate:
        # h lives in VMEM scratch, written at grid step 0 and read by every
        # later step: the grid must execute in order with scratch persisting
        # across steps ("arbitrary" semantics).
        kwargs["scratch_shapes"] = [pltpu.VMEM((a, n1, n2), jnp.float32),
                                    pltpu.VMEM((a, n1, n2), jnp.float32),
                                    pltpu.VMEM((n1, n2), jnp.float32)]
        if not interpret:
            kwargs["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=("arbitrary",))

    am = a * n1
    out_re, out_im = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[block_y, block_y,
                  full(h_shape), full(h_shape), full((n1, n2)),
                  full((n1, n2)), full((n1, n2)),
                  *(full((n1, n2)) for _ in range(len(stage_tw))),
                  full((n2, 2 * n2)), full((n2, 2 * n2)),
                  *(full((2 * am, am)) for _ in s1_ops)],
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((s, n1, n2), jnp.float32),
                   jax.ShapeDtypeStruct((s, n1, n2), jnp.float32)),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=24 * s * a * f * n2,
            bytes_accessed=(2 * s * a * f + 2 * s * f) * 4,
            transcendentals=0,
        ),
        **kwargs,
    )(yre, yim, h_re, h_im, hsq, twre, twim, *stage_tw, *consts, *s1_ops)

    return CArray(out_re.reshape(s, f), out_im.reshape(s, f))


def demod_parts_fused(pilot: CArray, data: CArray, x_full_perm: CArray, *,
                      ts: int | None = None, interpret=None,
                      exact: bool = True, schedule: str = "g2") -> CArray:
    """Pre-split (pilot, data) variant of demod_frame_fused (CP-free).

    Why it exists: consumers whose pilot and data arrive as separate
    streams (the sharded path's layout; split-phase estimate flows) get a
    first-class fused entry without re-stacking a frame tensor.  As a
    PERF lever it is a measured negative: under rigorous interleaving the
    whole-frame form is 1-3% FASTER (the in-jit pilot slice costs less
    than the separate pilot H2D + the lost tile-0 overlap) -- see
    docs/PERF.md negatives (r3); earlier same-session readings that showed
    the pre-splitting sharded path ahead were tunnel-window drift.

    Args:
      pilot: [A, F] planar (f32, or int16 sc16 planes -- widened here).
      data:  [S-1, A, F] or pre-shaped [S-1, A, n1, n2] planar data rows.
      x_full_perm: [F] padded pilot reference, fastpath permuted order.

    Returns [S-1, F-1] in reference layout.
    """
    if data.re.ndim == 4:
        f = data.shape[-2] * data.shape[-1]
    else:
        f = data.shape[-1]
    # One-dispatch pilot estimate in kernel layout (same numerics as
    # demod_frame_fused's default pilot_path="kernel").
    h3, inv_k = estimate_pilot_fused(pilot, x_full_perm,
                                     interpret=interpret, exact=exact)
    eq = fused_pipeline(data, h3.re, h3.im, inv_k, ts=ts,
                        interpret=interpret, exact=exact, schedule=schedule)
    return to_reference_order(eq, f)


def demod_frame_fused(frame: CArray, x_full_perm: CArray, *, cp: int,
                      ts: int | None = None, interpret=None,
                      exact: bool = True, schedule: str = "g2",
                      fuse_estimate: bool = False,
                      pilot_path: str = "kernel") -> CArray:
    """Drop-in for fastpath.demod_frame_fast backed by the fused kernel.

    Args:
      frame:       [S, A, F+cp] planar time-domain frame (pilot first), or
                   pre-shaped [S, A, n1, n2] when cp == 0 (skips the operand
                   layout copy; see fused_pipeline).
      x_full_perm: [F] planar padded pilot in permuted order
                   (fastpath.prepare_pilot_fast).
      fuse_estimate: compute the LS channel estimate INSIDE the kernel from
                   the pilot row's own stage-2 output (grid step 0, h in
                   VMEM scratch) instead of the separate XLA pilot path --
                   one fewer program stage, fewer dispatches, no pilot-row
                   widen for sc16 frames.  Same fp32-grade numerics (the
                   in-kernel pilot FFT uses the same bf16-split dots).
                   (Measured slower than the default: scratch h re-reads
                   defeat Mosaic's input-ref caching; docs/PERF.md.)
      pilot_path:  "kernel" (default): the pilot estimate runs as ONE
                   pallas dispatch emitting h in the data kernel's own
                   bitrev layout (estimate_pilot_fused) -- replaces ~10
                   small XLA ops of pilot path + reorder gathers whose
                   cost was dispatch gaps, not math.  "xla": the original
                   fft_permuted + ls_permuted route (kept for A/B).

    Returns:
      [S-1, F-1] planar demod output in reference layout (DC dropped,
      ifftshift applied).
    """
    from . import fastpath

    if frame.re.ndim == 4:
        if cp:
            raise ValueError("4D pre-shaped frames must be CP-free (cp=0)")
        y = frame
        f = y.shape[-2] * y.shape[-1]
        a = y.shape[1]
        if fuse_estimate:
            pilot_3d = None
        elif pilot_path == "kernel":
            pilot_3d = y[0]      # [A, n1, n2]: already the kernel layout
        else:
            pilot_3d = CArray(y.re[0].reshape(a, f), y.im[0].reshape(a, f))
    else:
        y = frame if cp == 0 else frame[..., cp:]
        f = y.shape[-1]
        pilot_3d = None if fuse_estimate else y[0]

    if fuse_estimate:
        denom = 1.0 / x_full_perm.abs2()
        eq = fused_pipeline(y, x_full_perm.re, x_full_perm.im, denom,
                            ts=ts, interpret=interpret, exact=exact,
                            schedule=schedule, fuse_estimate=True)
        return to_reference_order(eq, f)[1:]

    if pilot_path == "kernel":
        # One-dispatch pilot estimate straight into the kernel layout
        # (sc16 pilots stay int16 into the dispatch; scale rides its
        # twiddles exactly like the data kernel's).
        h3, inv_k = estimate_pilot_fused(pilot_3d, x_full_perm,
                                         interpret=interpret, exact=exact)
        hre, him, hsqinv = h3.re, h3.im, inv_k
    else:
        # Pilot symbol: one-off XLA FFT; LS estimate in permuted order (the
        # data rows of sc16-native frames convert in-kernel; see
        # fused_pipeline).
        p = fastpath.fft_permuted(fastpath.widen_sc16(pilot_3d))  # [A, F]
        h, hsq = fastpath.ls_permuted(p, x_full_perm)
        hre, him, hsqinv = h.re, h.im, 1.0 / hsq

    # The kernel runs over ALL S symbols, pilot row included: slicing the
    # data rows first (y[1:]) would copy the whole ~13 MB frame in HBM
    # (profiled at ~16 us/frame), while the extra pilot-row compute is free
    # for typical S (the padded tile count is unchanged) and its demod
    # output is dropped by the cheap [1:] output slice below.
    eq = fused_pipeline(y, hre, him, hsqinv, ts=ts, interpret=interpret,
                        exact=exact, schedule=schedule)
    return to_reference_order(eq, f)[1:]
