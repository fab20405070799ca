"""Benchmark: OFDM samples/s/chip for the FFT + LS + MRC chain.

Replicates the reference's benchmark contract (C14, ShMemSymBuff.hpp:77-189):
the 16-antenna x 1024-subcarrier x 101-symbol frame of gpuLS_main.cu, timed
per phase, summarized as avg+var -- and reduces it to the BASELINE.json
north-star metric: input complex samples processed per second per chip.

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


def bench_tpu(cfg, pilot, frame, reps: int) -> float:
    """Median seconds per frame for the jitted whole-frame pipeline,
    device-resident input (kernel speed-of-light, no H2D)."""
    import jax

    from ofdm_ls_mrc_tpu.models import UplinkReceiver
    from ofdm_ls_mrc_tpu.ops.cplx import CArray

    rx = UplinkReceiver(cfg, pilot)
    dev_frame = CArray.from_numpy(frame)
    dev_frame = CArray(jax.device_put(dev_frame.re), jax.device_put(dev_frame.im))
    # Warm-up compile (the reference's warm-up FFT, gpuLS_main.cu:94-97).
    jax.block_until_ready(rx.demod_frame(dev_frame).re)

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = rx.demod_frame(dev_frame)
        jax.block_until_ready(out.re)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def bench_golden(cfg, pilot, frame, reps: int) -> float:
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
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--golden-reps", type=int, default=3)
    ap.add_argument("--antennas", type=int, default=16)
    ap.add_argument("--fft", type=int, default=1024)
    ap.add_argument("--cp", type=int, default=72)
    ap.add_argument("--symbols", type=int, default=101)
    args = ap.parse_args()

    from ofdm_ls_mrc_tpu import FrameConfig

    cfg = FrameConfig(num_antennas=args.antennas, fft_size=args.fft,
                      cyclic_prefix=args.cp, frame_len=args.symbols)
    rng = np.random.default_rng(0)
    pilot = np.exp(2j * np.pi * rng.random(cfg.num_subcarriers)).astype(np.complex64)
    frame = (rng.standard_normal((cfg.frame_len, cfg.num_antennas, cfg.symbol_len))
             + 1j * rng.standard_normal((cfg.frame_len, cfg.num_antennas,
                                         cfg.symbol_len))).astype(np.complex64)

    samples_per_frame = cfg.frame_len * cfg.num_antennas * cfg.symbol_len

    t_tpu = bench_tpu(cfg, pilot, frame, args.reps)
    t_gold = bench_golden(cfg, pilot, frame, args.golden_reps)

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
