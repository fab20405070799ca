"""Fused-kernel schedule probe: per-frame device time of each experimental
issue order (ops/pallas_pipeline._kernel ``schedule``) at the reference
16 x 1024 x 101 geometry, measured with the R-loop elision-proof methodology
of bench.py (burst timings lie on this remote-execution setup).

The s1only/s2only probes bound the VPU and MXU chain times separately; the
gap between full and max(s1, s2) is the unoverlapped serial fraction.

Usage:  python tools/kernel_probe.py [--schedules block,fine] [--bf16]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))


def main():
    from bench import wait_for_device
    if not wait_for_device():
        raise SystemExit("TPU never became available "
                         "(stale chip claim or tunnel down)")

    ap = argparse.ArgumentParser()
    ap.add_argument("--schedules", default="block,fine,s1only,s2only")
    ap.add_argument("--bf16", action="store_true",
                    help="also probe exact=False for each schedule")
    ap.add_argument("--batch", type=int, default=20)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--r-hi", type=int, default=101)
    ap.add_argument("--antennas", type=int, default=16)
    ap.add_argument("--fft", type=int, default=1024)
    ap.add_argument("--symbols", type=int, default=101)
    ap.add_argument("--ts", type=int, default=None)
    ap.add_argument("--input", default="f32", choices=["f32", "i16"],
                    help="kernel input dtype: f32 (default) or i16 "
                         "(sc16-native planar int16 -- half the input DMA)")
    args = ap.parse_args()

    import jax

    from bench import _make_repeated

    from ofdm_ls_mrc_tpu.ops.cplx import CArray
    from ofdm_ls_mrc_tpu.ops.fastpath import prepare_pilot_fast
    from ofdm_ls_mrc_tpu.ops.pallas_pipeline import (
        demod_frame_fused,
        fused_frame_shape,
    )

    a, f, s, k = args.antennas, args.fft, args.symbols, args.batch
    rng = np.random.default_rng(0)
    pilot = np.exp(2j * np.pi * rng.random(f - 1)).astype(np.complex64)
    x_perm = prepare_pilot_fast(pilot, f)
    frames = (rng.standard_normal((k, s, a, f))
              + 1j * rng.standard_normal((k, s, a, f))).astype(np.complex64)
    frames = frames.reshape((k,) + fused_frame_shape(s, a, f))
    cf = CArray.from_numpy(frames)
    if args.input == "i16":
        from ofdm_ls_mrc_tpu.golden.io import plane_to_sc16 as to16
        cf = CArray(to16(cf.re), to16(cf.im))
    cf = CArray(jax.device_put(cf.re), jax.device_put(cf.im))

    def measure(schedule, exact):
        demod = functools.partial(demod_frame_fused, cp=0, exact=exact,
                                  schedule=schedule, ts=args.ts)
        fn = lambda x, xp: demod(x, x_full_perm=xp)

        def timed(r):
            g = _make_repeated(fn, r)
            float(g(cf, x_perm))
            best = float("inf")
            for _ in range(args.reps):
                t0 = time.perf_counter()
                float(g(cf, x_perm))
                best = min(best, time.perf_counter() - t0)
            return best

        t1, thi = timed(1), timed(args.r_hi)
        return max(thi - t1, 1e-12) / ((args.r_hi - 1) * k)

    precisions = [True] + ([False] if args.bf16 else [])
    for sched in args.schedules.split(","):
        for exact in precisions:
            t = measure(sched, exact)
            label = f"{sched}/{'exact' if exact else 'bf16 '}"
            print(f"{label:16s} {t*1e6:8.2f} us/frame  "
                  f"{s*a*f/t/1e9:7.2f} Gs/s", flush=True)


if __name__ == "__main__":
    main()
