"""Benchmark: OFDM samples/s/chip for the FFT + LS + MRC chain.

Replicates the reference's benchmark contract (C14, ShMemSymBuff.hpp:77-189):
the 16-antenna x 1024-subcarrier x 101-symbol frame of gpuLS_main.cu, reduced
to the BASELINE.json north-star metric: input complex samples processed per
second per chip.

Measurement methodology (important on remote-executed TPU backends): async
dispatch timing is unreliable -- ``block_until_ready`` may return before
compute completes and a host fetch carries a fixed ~30 ms sync cost.  So the
whole measurement runs INSIDE one jitted program: a scan over K resident
frames repeated R times with a scalar data dependency chaining repetitions
(preventing elision), synchronized by fetching one scalar.  Per-frame time
is the R=R1 vs R=1 difference divided by the extra frames -- fixed overhead
cancels exactly.

``vs_baseline`` is the speedup over the golden NumPy implementation of the
same chain on this host's CPU (the stand-in for the reference cpuLS, whose
absolute numbers the reference never published -- BASELINE.md).

Prints ONE JSON line.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _make_repeated(demod_one, frames_c, reps: int):
    import jax
    import jax.numpy as jnp

    def prog(frs):
        def rep(r, acc):
            def body(c, x):
                from ofdm_ls_mrc_tpu.ops.cplx import CArray
                out = demod_one(CArray(x.re + c, x.im))
                return c + (jnp.sum(out.re) + jnp.sum(out.im)) * 1e-20, None
            c, _ = jax.lax.scan(body, acc, frs)
            return c
        return jax.lax.fori_loop(0, reps, rep, 0.0)

    return jax.jit(prog)


def bench_tpu(cfg, pilot, frames: np.ndarray, reps: int,
              pipeline: str = "fused") -> float:
    """Seconds per frame for the jitted whole-frame pipeline on-device."""
    import functools

    import jax

    from ofdm_ls_mrc_tpu.ops.cplx import CArray
    from ofdm_ls_mrc_tpu.ops.fastpath import (_fast_split, demod_frame_fast,
                                              prepare_pilot_fast)

    k = frames.shape[0]
    cf = CArray.from_numpy(frames)
    cf = CArray(jax.device_put(cf.re), jax.device_put(cf.im))
    x_perm = prepare_pilot_fast(pilot, cfg.fft_size)
    if pipeline == "fused" and _fast_split(cfg.fft_size) == (8, 128):
        from ofdm_ls_mrc_tpu.ops.pallas_pipeline import demod_frame_fused
        demod_one = functools.partial(demod_frame_fused, x_full_perm=x_perm,
                                      cp=cfg.cyclic_prefix)
    else:
        demod_one = functools.partial(demod_frame_fast, x_full_perm=x_perm,
                                      cp=cfg.cyclic_prefix)

    def timed(r):
        f = _make_repeated(demod_one, cf, r)
        float(f(cf))  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(cf))
            best = min(best, time.perf_counter() - t0)
        return best

    r_hi = 21
    t1, thi = timed(1), timed(r_hi)
    return max(thi - t1, 1e-12) / ((r_hi - 1) * k)


def bench_golden(cfg, pilot, frame: np.ndarray, reps: int) -> float:
    """Median seconds per frame for the golden NumPy chain (cpuLS stand-in)."""
    from ofdm_ls_mrc_tpu.golden import dsp

    dsp.demod_frame(frame, pilot, cfg.cyclic_prefix)  # warm cache
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        dsp.demod_frame(frame, pilot, cfg.cyclic_prefix)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3,
                    help="timing repetitions per R setting (best-of)")
    ap.add_argument("--batch", type=int, default=20,
                    help="device-resident frames per measurement")
    ap.add_argument("--golden-reps", type=int, default=3)
    ap.add_argument("--antennas", type=int, default=16)
    ap.add_argument("--fft", type=int, default=1024)
    ap.add_argument("--cp", type=int, default=72)
    ap.add_argument("--symbols", type=int, default=101)
    ap.add_argument("--precision", default="high",
                    choices=["default", "high", "highest"])
    ap.add_argument("--pipeline", default="fused", choices=["fused", "fast"],
                    help="fused = whole-pipeline Pallas kernel (fp32-grade "
                         "bf16-split dots); fast = XLA fastpath at --precision")
    args = ap.parse_args()

    from ofdm_ls_mrc_tpu import FrameConfig
    from ofdm_ls_mrc_tpu.ops import fft as fft_ops

    fft_ops.set_precision(args.precision)
    cfg = FrameConfig(num_antennas=args.antennas, fft_size=args.fft,
                      cyclic_prefix=args.cp, frame_len=args.symbols)
    rng = np.random.default_rng(0)
    pilot = np.exp(2j * np.pi * rng.random(cfg.num_subcarriers)).astype(np.complex64)
    frames = (rng.standard_normal((args.batch, cfg.frame_len, cfg.num_antennas,
                                   cfg.symbol_len))
              + 1j * rng.standard_normal((args.batch, cfg.frame_len,
                                          cfg.num_antennas, cfg.symbol_len))
              ).astype(np.complex64)

    samples_per_frame = cfg.frame_len * cfg.num_antennas * cfg.symbol_len

    t_tpu = bench_tpu(cfg, pilot, frames, args.reps, pipeline=args.pipeline)
    t_gold = bench_golden(cfg, pilot, frames[0], args.golden_reps)

    sps = samples_per_frame / t_tpu
    sps_gold = samples_per_frame / t_gold
    print(json.dumps({
        "metric": "ofdm_samples_per_sec_per_chip",
        "value": round(sps, 1),
        "unit": "samples/s",
        "vs_baseline": round(sps / sps_gold, 2),
    }))


if __name__ == "__main__":
    main()
