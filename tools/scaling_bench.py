"""Antenna-scaling efficiency harness (BASELINE.json metric 2).

Runs the SHARDED uplink receiver (parallel/sharded.py -- antenna-sharded MRC
with one fused psum, the distributed form of the reference's intra-GPU
antenna tree-reduce, gpuLS.cu:198-203,247-252) over a growing ``ant`` mesh
axis and reports a scaling table: seconds/frame, total samples/s,
samples/s/chip, efficiency vs the 1-shard run, and the psum payload
bytes/frame each shard contributes.

On a TPU pod slice this measures real ICI scaling.  On a single host it runs
on the virtual CPU mesh (``--virtual 8``): every "device" shares the same
host cores, so efficiency there validates the COLLECTIVE STRUCTURE (payload
size, no pathological resharding) rather than hardware scaling -- the same
harness runs unchanged on a pod later.

Usage:
  python tools/scaling_bench.py --virtual 8                  # CPU mesh
  python tools/scaling_bench.py --shards 1 --batch 8         # hw single chip
  python tools/scaling_bench.py --antennas 64 --virtual 8 --pipeline fast
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shards", default="1,2,4,8",
                    help="comma list of shard counts for the swept axis")
    ap.add_argument("--axis", default="ant", choices=["ant", "time"],
                    help="mesh axis to sweep: 'ant' (antenna-sharded MRC, "
                         "one fused psum) or 'time' (symbol-block data "
                         "parallelism, zero collectives)")
    ap.add_argument("--entry", default="split", choices=["split", "whole"],
                    help="sharded entry (whole = kernel-native frames, "
                         "pilot sliced in-shard; fused body only)")
    ap.add_argument("--virtual", type=int, default=0, metavar="N",
                    help="run on an N-device virtual CPU mesh (forces the "
                         "cpu platform; must be >= max shards)")
    ap.add_argument("--antennas", type=int, default=16)
    ap.add_argument("--fft", type=int, default=1024)
    ap.add_argument("--symbols", type=int, default=101)
    ap.add_argument("--batch", type=int, default=2,
                    help="device-resident frames per measurement")
    ap.add_argument("--reps", type=int, default=3, help="best-of repetitions")
    ap.add_argument("--r-hi", type=int, default=None,
                    help="in-program repeat count (default: 5 on the virtual "
                         "CPU mesh, 101 on hardware -- see "
                         "docs/PERF.md methodology)")
    ap.add_argument("--pipeline", default="fast", choices=["fast", "fused"],
                    help="shard body (fused = Pallas kernel per shard; "
                         "interpret-mode on CPU is slow)")
    ap.add_argument("--out", default=None, metavar="FILE",
                    help="also write the JSON record to FILE (the committed "
                         "SCALING_r*.json artifacts; analogue of the "
                         "reference's per-run timing dumps, "
                         "gpuLS_main.cu:106-142)")
    args = ap.parse_args()

    if args.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual}")
    import jax
    if args.virtual:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                    "..")))
    from bench import bench_sharded, psum_payload_bytes, wait_for_device

    if not args.virtual and not wait_for_device():
        # Same stale-chip-claim guard as bench/latency_probe/kernel_probe:
        # touching jax.devices() in-process on a wedged axon claim hangs
        # indistinguishably from progress.
        raise SystemExit("TPU never became available "
                         "(stale chip claim or tunnel down)")

    from ofdm_ls_mrc_tpu import FrameConfig
    from ofdm_ls_mrc_tpu.ops import fft as fft_ops

    shards = [int(s) for s in args.shards.split(",")]
    ndev = len(jax.devices())
    if max(shards) > ndev:
        raise SystemExit(f"need {max(shards)} devices, have {ndev} "
                         f"(use --virtual {max(shards)})")
    r_hi = args.r_hi or (5 if args.virtual else 101)

    cfg = FrameConfig(num_antennas=args.antennas, fft_size=args.fft,
                      cyclic_prefix=0, frame_len=args.symbols)
    fft_ops.set_precision("high")
    rng = np.random.default_rng(0)
    pilot = np.exp(2j * np.pi * rng.random(cfg.num_subcarriers)
                   ).astype(np.complex64)
    frames = (rng.standard_normal((args.batch, cfg.frame_len,
                                   cfg.num_antennas, cfg.symbol_len))
              + 1j * rng.standard_normal((args.batch, cfg.frame_len,
                                          cfg.num_antennas, cfg.symbol_len))
              ).astype(np.complex64)
    samples_per_frame = cfg.frame_len * cfg.num_antennas * cfg.fft_size

    rows = []
    t1 = None
    baseline_n = None
    for n in shards:
        if args.axis == "ant":
            if cfg.num_antennas % n:
                print(f"skip {n} shards: {cfg.num_antennas} antennas "
                      f"not divisible")
                continue
            mesh_shape = (n, 1)
        else:
            if cfg.num_data_symbols % n:
                print(f"skip {n} shards: {cfg.num_data_symbols} data symbols "
                      f"not divisible")
                continue
            mesh_shape = (1, n)
        t = bench_sharded(cfg, pilot, frames, args.reps, mesh_shape,
                          pipeline=args.pipeline, r_hi=r_hi,
                          entry=args.entry)
        if t < 1e-9:
            # The R-vs-1 difference came out non-positive (measurement noise
            # exceeded the work at this r_hi); report it instead of an
            # absurd throughput.
            print(f"{args.axis}={n:2d}  measurement unreliable at r_hi={r_hi} "
                  f"(non-positive R-loop delta); re-run with a higher "
                  f"--r-hi", flush=True)
            continue
        if t1 is None:
            t1, baseline_n = t, n
        # Efficiency is labeled against the ACTUAL surviving baseline shard
        # count -- if the 1-shard row was skipped as unreliable, later rows
        # must not masquerade as "vs 1 shard".
        eff = (t1 * baseline_n) / (n * t)
        # The fused psum rides the ``ant`` axis only; its payload per shard
        # shrinks with time sharding (S_local data symbols) and the time
        # axis itself adds zero collectives.
        payload = psum_payload_bytes(cfg, n if args.axis == "time" else 1)
        rows.append({f"{args.axis}_shards": n, "sec_per_frame": t,
                     "total_samples_per_sec": samples_per_frame / t,
                     "samples_per_sec_per_chip": samples_per_frame / t / n,
                     f"efficiency_vs_{baseline_n}shard": eff,
                     "psum_payload_bytes_per_frame": payload})
        print(f"{args.axis}={n:2d}  {t*1e6:10.1f} us/frame  "
              f"{samples_per_frame/t/1e9:8.2f} Gs/s total  "
              f"{samples_per_frame/t/n/1e9:8.2f} Gs/s/chip  "
              f"eff={eff*100:6.1f}% (vs {baseline_n} shard)  "
              f"psum={payload} B/frame", flush=True)

    # Structural record (BASELINE metric 2): read the collective structure
    # off the compiled HLO of the SAME entry the rows measured, so the
    # artifact carries its own evidence -- psum payload actually constant
    # across ant-shard counts, time axis actually collective-free -- not
    # just wall times and a prose claim.
    structure = None
    if rows:
        from ofdm_ls_mrc_tpu.ops.cplx import CArray
        from ofdm_ls_mrc_tpu.parallel import ShardedUplinkReceiver, make_mesh
        from ofdm_ls_mrc_tpu.parallel.structure import (
            collective_signature, expected_psum_payload_words)

        def sig_at(n):
            mesh_shape = (n, 1) if args.axis == "ant" else (1, n)
            mesh = make_mesh(*mesh_shape, devices=jax.devices()[:n])
            rx = ShardedUplinkReceiver(cfg, pilot, mesh,
                                       pipeline=args.pipeline)
            if args.entry == "whole" and rx._demod_whole is not None:
                from ofdm_ls_mrc_tpu.ops.pallas_pipeline import (
                    fused_frame_shape)
                sh4 = fused_frame_shape(cfg.frame_len, cfg.num_antennas,
                                        cfg.fft_size)
                fr4 = CArray(frames[0].real.astype(np.float32).reshape(sh4),
                             frames[0].imag.astype(np.float32).reshape(sh4))
                if args.axis == "time" and n > 1:
                    fr4 = rx.place_whole(fr4)
                txt = rx._demod_whole.lower(fr4, rx.x_full).compile().as_text()
                return collective_signature(txt) + ("whole",)
            c = CArray.from_numpy(frames[0])
            txt = rx._demod.lower(c[0], c[1:], rx.x_full).compile().as_text()
            return collective_signature(txt) + ("split",)

        measured = [r[f"{args.axis}_shards"] for r in rows]
        n_hi = measured[-1]
        count, words, entry_used = sig_at(n_hi)
        t_shards = n_hi if args.axis == "time" else 1
        structure = {
            "axis": args.axis,
            "structure_entry": entry_used,
            "verified_at_shards": n_hi,
            "all_reduce_count": count,
            "psum_payload_fp32_words": words,
            "expected_fp32_words": expected_psum_payload_words(cfg, t_shards),
        }
        if args.axis == "ant":
            # The load-bearing claim: antennas reduce locally BEFORE the
            # collective, so the payload must not grow with shard count --
            # check it at two shard counts instead of asserting it in prose.
            lo = [n for n in measured if n > 1 and n != n_hi]
            if lo:
                count_lo, words_lo, _ = sig_at(lo[0])
                structure["payload_constant_across_shards"] = (
                    count_lo == count and words_lo == words)
                structure["also_verified_at_shards"] = lo[0]
        else:
            # ant=1 meshes: XLA may elide the size-1-axis psum entirely;
            # either way the TIME axis must add no collectives of its own.
            structure["time_axis_collective_free"] = count <= 1
        print(f"structure@{args.axis}={n_hi} ({entry_used} entry): "
              f"{count} all-reduce, {words} fp32 words "
              f"(split-entry expectation "
              f"{structure['expected_fp32_words']})", flush=True)

    rec = {
        "metric": f"{'antenna' if args.axis == 'ant' else 'time'}_scaling",
        "axis": args.axis,
        "entry": args.entry,
        "pipeline": args.pipeline,
        "platform": jax.devices()[0].platform,
        "virtual": bool(args.virtual),
        "r_hi": r_hi,
        "config": {"antennas": args.antennas, "fft": args.fft,
                   "symbols": args.symbols},
        "structure": structure,
        "rows": rows,
    }
    if args.virtual:
        rec["note"] = (
            "virtual CPU mesh: all shards TIMESHARE this host's cores, so "
            "per-chip efficiency is NOT hardware scaling -- flat-to-falling "
            "wall time across shard counts plus the constant psum payload "
            "(structure field) is the pass criterion here; real ICI scaling "
            "needs a pod (docs/PERF.md antenna-scaling budget).")
    print(json.dumps(rec))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rec, f, indent=1)
            f.write("\n")


if __name__ == "__main__":
    main()
