"""Shared-compile interleaved A/B: sharded entry 'split' vs 'whole'.

Tunnel drift makes cross-process comparisons lie (docs/PERF.md r3
pre-split negative: a fake 6% win inverted to a real 2% loss under
rigorous interleaving).  This probe compiles BOTH entries' R=1 and R=hi
programs up front, then alternates their timing loops within seconds, so
every trial pair shares one tunnel window:

  split -- pre-split (pilot, data) placement through the 4-D shard_map
           specs (the shipped bench --mesh path)
  whole -- whole kernel-native [S, A, n1, n2] frames, pilot row sliced
           in-shard (ShardedUplinkReceiver.demod_whole; time_shards==1)

Usage:  python tools/ab_sharded.py [--mesh 1x1] [--input sc16]
                                   [--antennas 16] [--trials 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", default="1x1", metavar="ANTxTIME")
    ap.add_argument("--input", default="sc16", choices=["f32", "sc16"])
    ap.add_argument("--kernel-precision", default="exact",
                    choices=["exact", "bf16"])
    ap.add_argument("--antennas", type=int, default=16)
    ap.add_argument("--fft", type=int, default=1024)
    ap.add_argument("--symbols", type=int, default=101)
    ap.add_argument("--batch", type=int, default=20)
    ap.add_argument("--reps", type=int, default=4,
                    help="best-of reps per timing point per trial")
    ap.add_argument("--r-hi", type=int, default=101)
    ap.add_argument("--trials", type=int, default=3,
                    help="interleaved A/B trial pairs")
    args = ap.parse_args()

    from bench import sharded_setup, wait_for_device
    if not wait_for_device():
        raise SystemExit("TPU never became available "
                         "(stale chip claim or tunnel down)")

    from ofdm_ls_mrc_tpu.config import FrameConfig

    # CP-free frames (the kernel-native layouts need cp=0, as bench.py's
    # host-side CP drop produces).
    cfg = FrameConfig(num_antennas=args.antennas, fft_size=args.fft,
                      cyclic_prefix=0, frame_len=args.symbols)
    rng = np.random.default_rng(11)
    frames = (rng.standard_normal((args.batch, cfg.frame_len,
                                   cfg.num_antennas, cfg.fft_size))
              + 1j * rng.standard_normal((args.batch, cfg.frame_len,
                                          cfg.num_antennas, cfg.fft_size))
              ).astype(np.complex64) * 0.1
    pilot = np.exp(2j * np.pi * rng.random(cfg.num_subcarriers)
                   ).astype(np.complex64)
    n_ant, n_time = (int(v) for v in args.mesh.lower().split("x"))
    exact = args.kernel_precision == "exact"
    k = args.batch

    progs = {}
    for entry in ("split", "whole"):
        make, xs, xp = sharded_setup(cfg, pilot, frames, (n_ant, n_time),
                                     pipeline="fused",
                                     input_dtype=args.input,
                                     exact=exact, entry=entry)
        f1, fhi = make(1), make(args.r_hi)
        print(f"compiling {entry} ...", file=sys.stderr)
        float(f1(xs, xp)); float(fhi(xs, xp))   # compile + warm both
        progs[entry] = (f1, fhi, xs, xp)

    def best_of(f, xs, xp, n):
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            float(f(xs, xp))
            best = min(best, time.perf_counter() - t0)
        return best

    us = {"split": [], "whole": []}
    for trial in range(args.trials):
        for entry in ("split", "whole") if trial % 2 == 0 else ("whole", "split"):
            f1, fhi, xs, xp = progs[entry]
            t1 = best_of(f1, xs, xp, args.reps)
            thi = best_of(fhi, xs, xp, args.reps)
            per = max(thi - t1, 1e-12) / ((args.r_hi - 1) * k) * 1e6
            us[entry].append(per)
            print(f"trial {trial} {entry:5s}: {per:7.2f} us/frame",
                  file=sys.stderr)

    spf = cfg.frame_len * cfg.num_antennas * cfg.fft_size
    out = {}
    for entry in ("split", "whole"):
        b = min(us[entry])
        out[entry] = {"us_per_frame": [round(v, 2) for v in us[entry]],
                      "best_us": round(b, 2),
                      "gs_per_sec": round(spf / b / 1e3, 2)}
    out["whole_vs_split"] = round(min(us["split"]) / min(us["whole"]), 4)
    import json
    print(json.dumps(out))


if __name__ == "__main__":
    main()
