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
import os
import subprocess
import sys
import time

import numpy as np


_PROBE_CODE = "import jax; jax.devices()"


def _configured_platforms():
    """The in-process jax_platforms override, if jax is imported and the
    caller set one (None otherwise) -- reads sys.modules so merely asking
    does not import jax in processes that must stay jax-free pre-probe."""
    jx = sys.modules.get("jax")
    if jx is None:
        return None
    try:
        return jx.config.jax_platforms
    except Exception:
        return None


def wait_for_device(attempts: int = 60, probe_timeout: float = 60.0,
                    sleep_s: float = 30.0) -> bool:
    """Pre-flight for claim-based single-chip backends (axon): wait until
    PJRT init succeeds before touching jax in THIS process.

    The axon chip is granted through a relay; a stale claim (e.g. a killed
    process whose grant has not expired yet) makes in-process PJRT init HANG
    indefinitely rather than fail.  Probing init in a disposable subprocess
    keeps the bench process un-wedgeable and rides out claim expiry.
    Bounded: ~attempts * (probe_timeout + sleep_s) worst case (defaults
    ~90 min -- observed outages exceed two hours, and a patient bench that
    eventually prints JSON beats a fast one that hangs; OFDM_BENCH_WAIT_S
    overrides the budget in seconds).

    Returns True when a probe succeeded, False when the budget ran out --
    callers should FAIL FAST on False (attempting init on a wedged claim
    hangs forever, which no driver timeout can distinguish from progress).
    Skipped (True) unless the session targets the axon platform, and under
    OFDM_BENCH_NO_WAIT=1.  Also skipped when the caller already forced a
    non-axon platform in-process (``jax.config.update("jax_platforms",
    "cpu")`` -- the repro/dryrun path): the probe subprocess would test the
    axon chip the caller is deliberately not using.
    """
    if "axon" not in os.environ.get("JAX_PLATFORMS", ""):
        return True
    if os.environ.get("OFDM_BENCH_NO_WAIT") == "1":
        return True
    plats = _configured_platforms()
    if plats and "axon" not in plats:
        return True
    budget_s = os.environ.get("OFDM_BENCH_WAIT_S")
    if budget_s is not None:
        attempts = max(1, int(float(budget_s) / (probe_timeout + sleep_s)))
    for i in range(attempts):
        try:
            r = subprocess.run([sys.executable, "-c", _PROBE_CODE],
                               timeout=probe_timeout, capture_output=True)
            if r.returncode == 0:
                if i:
                    print(f"bench: device available after {i + 1} probes",
                          file=sys.stderr)
                return True
        except subprocess.TimeoutExpired:
            pass
        print(f"bench: device-init probe {i + 1}/{attempts} failed "
              f"(chip claim busy or tunnel down); retrying in {sleep_s:.0f}s",
              file=sys.stderr)
        time.sleep(sleep_s)
    print("bench: device never became available", file=sys.stderr)
    return False


def _make_repeated(demod_xp, reps: int):
    """Repeat-R program with the anti-elision data dependency threaded through
    the [F] pilot reference (a trivial add) rather than the 13 MB frame
    tensor: every repetition computes a genuinely different channel estimate
    (so nothing can be cached across reps) while the frames stay resident
    and untouched."""
    import jax
    import jax.numpy as jnp

    from ofdm_ls_mrc_tpu.ops.cplx import CArray

    def prog(frs, xp):
        def rep(r, acc):
            def body(c, x):
                xpc = CArray(xp.re + c, xp.im)
                out = demod_xp(x, xpc)
                return c + (jnp.sum(out.re) + jnp.sum(out.im)) * 1e-20, None
            c, _ = jax.lax.scan(body, acc, frs)
            return c
        return jax.lax.fori_loop(0, reps, rep, 0.0)

    return jax.jit(prog)


def bench_tpu(cfg, pilot, frames: np.ndarray, reps: int,
              pipeline: str = "fused", exact: bool = True,
              input_dtype: str = "f32", fuse_estimate: bool = False) -> float:
    """Seconds per frame for the jitted whole-frame pipeline on-device."""
    import functools

    import jax

    from ofdm_ls_mrc_tpu.ops.cplx import CArray
    from ofdm_ls_mrc_tpu.ops.fastpath import demod_frame_fast, prepare_pilot_fast

    k = frames.shape[0]
    x_perm = prepare_pilot_fast(pilot, cfg.fft_size)
    from ofdm_ls_mrc_tpu.ops.pallas_pipeline import fused_frame_shape, supports_fused
    fused = pipeline == "fused" and supports_fused(cfg.fft_size)
    if input_dtype == "sc16" and not fused:
        raise SystemExit("--input sc16 requires the fused pipeline")
    if fused:
        from ofdm_ls_mrc_tpu.ops.pallas_pipeline import demod_frame_fused
        # bf16 speed mode: stage-1 rides the MXU too ("g8x" -- the block-
        # diagonal DFT dot), measured ~8% faster than g2 at bf16 where the
        # VPU chain binds; exact keeps g2 (3x stage-1 MACs sink the
        # MXU-bound exact kernel, docs/PERF.md r5).
        demod_xp = functools.partial(demod_frame_fused, cp=cfg.cyclic_prefix,
                                     exact=exact, fuse_estimate=fuse_estimate,
                                     schedule=("g2" if exact else "g8x"))
        if cfg.cyclic_prefix == 0:
            # Place frames in the kernel's [.., n1, n2] layout (free on the
            # host) so the custom call needs no operand re-tiling copy.
            # (Pre-split (pilot, data) placement via demod_parts_fused was
            # ALSO tried and measured 0.97-0.99x of this whole-frame form
            # under rigorous interleaving -- docs/PERF.md negatives, r3.)
            k_, s_, a_, _ = frames.shape
            frames = frames.reshape((k_,) + fused_frame_shape(s_, a_, cfg.fft_size))
    else:
        demod_xp = functools.partial(demod_frame_fast, cp=cfg.cyclic_prefix)
    cf = CArray.from_numpy(frames)
    if input_dtype == "sc16":
        # sc16-native input: planar int16 planes (half the H2D and input HBM
        # bytes; the kernel widens in VMEM, full-scale factor on the twiddle
        # constants).  Fused pipeline only.
        from ofdm_ls_mrc_tpu.golden.io import plane_to_sc16 as to16
        cf = CArray(to16(cf.re), to16(cf.im))
    cf = CArray(jax.device_put(cf.re), jax.device_put(cf.im))
    demod_xp_kw = lambda x, xp: demod_xp(x, x_full_perm=xp)

    def timed(r):
        f = _make_repeated(demod_xp_kw, r)
        float(f(cf, x_perm))  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(cf, x_perm))
            best = min(best, time.perf_counter() - t0)
        return best

    # A large R gap amortizes host/tunnel jitter (which can exceed the
    # per-frame time by orders of magnitude on remote-executed backends);
    # min-of-N approximates the uncontended machine for both endpoints.
    r_hi = 101
    t1, thi = timed(1), timed(r_hi)
    return max(thi - t1, 1e-12) / ((r_hi - 1) * k)


def psum_payload_bytes(cfg, n_time: int) -> int:
    """Logical bytes each device contributes to the fused MRC psum per frame:
    the (num_re, num_im, |H|^2) payload -- (2*S_local + 1) * F fp32 words,
    S_local = data symbols per time shard.  The TPU-native cost model for the
    reference's antenna tree-reduction (gpuLS.cu:198-203,247-252)."""
    s_local = cfg.num_data_symbols // n_time
    return (2 * s_local + 1) * cfg.fft_size * 4


def sharded_setup(cfg, pilot, frames: np.ndarray, mesh_shape,
                  pipeline: str = "fast", input_dtype: str = "f32",
                  exact: bool = True, entry: str = "split"):
    """Build the sharded receiver, place inputs with the mesh shardings, and
    return ``(make, scan_xs, xp)``: ``make(r)`` jits the elision-proof R-rep
    program over the placed operands.  Shared by bench_sharded and the
    shared-compile A/B probe (tools/ab_sharded.py)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ofdm_ls_mrc_tpu.ops.cplx import CArray
    from ofdm_ls_mrc_tpu.parallel import ShardedUplinkReceiver, make_mesh
    from ofdm_ls_mrc_tpu.parallel.mesh import ANT_AXIS, TIME_AXIS

    n_ant, n_time = mesh_shape
    ndev = n_ant * n_time
    devs = jax.devices()
    if len(devs) < ndev:
        raise SystemExit(f"--mesh {n_ant}x{n_time} needs {ndev} devices, "
                         f"have {len(devs)}")
    mesh = make_mesh(n_ant, n_time, devices=devs[:ndev])
    rx = ShardedUplinkReceiver(cfg, pilot, mesh, pipeline=pipeline,
                               exact=exact)

    k = frames.shape[0]
    c = CArray.from_numpy(frames)                      # [K, S, A, N]
    if input_dtype == "sc16":
        if not (rx.pipeline == "fused" and cfg.cyclic_prefix == 0):
            raise SystemExit("--mesh with --input sc16 needs the fused "
                             "shard body and cp=0")
        from ofdm_ls_mrc_tpu.golden.io import plane_to_sc16 as to16
        c = CArray(to16(c.re), to16(c.im))
    if entry == "whole":
        if rx._demod_whole is None:
            raise SystemExit("--sharded-entry whole needs the fused shard "
                             "body and cp=0")
        from ofdm_ls_mrc_tpu.ops.fastpath import _fast_split
        from ofdm_ls_mrc_tpu.parallel.sharded import whole_blocks
        n1, n2 = _fast_split(cfg.fft_size)
        s, a = cfg.frame_len, cfg.num_antennas
        n_time = mesh.shape["time"]
        fs = NamedSharding(mesh, P(None, *rx._whole_spec))
        blk = lambda v: whole_blocks(
            np.ascontiguousarray(v.reshape(k, s, a, n1, n2)), n_time, axis=1)
        frames5 = CArray(jax.device_put(blk(c.re), fs),
                         jax.device_put(blk(c.im), fs))
        scan_xs = (frames5,)
        demodw = rx._demod_whole
        call = lambda xs, xpc: demodw(xs[0], xpc)
    elif rx.pipeline == "fused" and cfg.cyclic_prefix == 0:
        # Kernel-native placement: frames enter shard_map in the fused
        # kernel's own [.., A, n1, n2] layout (a free host-side reshape), so
        # the sharded body pays no per-frame operand re-tiling copy -- the
        # same optimization the unsharded bench ships (VERDICT r2 Next #3).
        from ofdm_ls_mrc_tpu.ops.fastpath import _fast_split
        n1, n2 = _fast_split(cfg.fft_size)
        s = cfg.frame_len
        a = cfg.num_antennas
        re4 = c.re.reshape(k, s, a, n1, n2)
        im4 = c.im.reshape(k, s, a, n1, n2)
        ps = NamedSharding(mesh, P(None, ANT_AXIS, None, None))
        ds = NamedSharding(mesh, P(None, TIME_AXIS, ANT_AXIS, None, None))
        pilots = CArray(jax.device_put(np.ascontiguousarray(re4[:, 0]), ps),
                        jax.device_put(np.ascontiguousarray(im4[:, 0]), ps))
        datas = CArray(jax.device_put(np.ascontiguousarray(re4[:, 1:]), ds),
                       jax.device_put(np.ascontiguousarray(im4[:, 1:]), ds))
        demod = rx._demod4
        scan_xs = (pilots, datas)
        call = lambda xs, xpc: demod(xs[0], xs[1], xpc)
    else:
        ps = NamedSharding(mesh, P(None, ANT_AXIS, None))
        ds = NamedSharding(mesh, P(None, TIME_AXIS, ANT_AXIS, None))
        pilots = CArray(jax.device_put(np.ascontiguousarray(c.re[:, 0]), ps),
                        jax.device_put(np.ascontiguousarray(c.im[:, 0]), ps))
        datas = CArray(jax.device_put(np.ascontiguousarray(c.re[:, 1:]), ds),
                       jax.device_put(np.ascontiguousarray(c.im[:, 1:]), ds))
        demod = rx._demod
        scan_xs = (pilots, datas)
        call = lambda xs, xpc: demod(xs[0], xs[1], xpc)
    xp = rx.x_full

    def make(r):
        def prog(xs, xpv):
            def rep(_, acc):
                def body(cacc, x):
                    xpc = CArray(xpv.re + cacc, xpv.im)
                    out = call(x, xpc)
                    return cacc + (jnp.sum(out.re) + jnp.sum(out.im)) * 1e-20, None
                cacc, _ = jax.lax.scan(body, acc, xs)
                return cacc
            return jax.lax.fori_loop(0, r, rep, 0.0)
        return jax.jit(prog)

    return make, scan_xs, xp


def bench_sharded(cfg, pilot, frames: np.ndarray, reps: int,
                  mesh_shape, pipeline: str = "fast", r_hi: int = 101,
                  input_dtype: str = "f32", exact: bool = True,
                  entry: str = "split") -> float:
    """Seconds per frame for the SHARDED receiver over an (ant, time) mesh.

    Same elision-proof R-loop as bench_tpu, with inputs placed with the mesh
    shardings so the timed program contains no input resharding -- only the
    pipeline body and its single fused psum over the ``ant`` axis.
    ``input_dtype='sc16'`` places planar int16 shards (fused body only; the
    kernel widens in VMEM).  ``entry='split'`` pre-splits each frame into
    (pilot, data); ``entry='whole'`` (fused, cp=0) places whole
    kernel-native frames and slices the pilot in-shard, mirroring the
    unsharded bench's whole-frame form (time-sharded meshes get the
    pilot-per-block layout).
    """
    make, scan_xs, xp = sharded_setup(cfg, pilot, frames, mesh_shape,
                                      pipeline=pipeline,
                                      input_dtype=input_dtype,
                                      exact=exact, entry=entry)
    k = frames.shape[0]

    def timed(r):
        f = make(r)
        float(f(scan_xs, xp))  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(scan_xs, xp))
            best = min(best, time.perf_counter() - t0)
        return best

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
    ap.add_argument("--reps", type=int, default=5,
                    help="timing repetitions per R setting (best-of)")
    ap.add_argument("--batch", type=int, default=20,
                    help="device-resident frames per measurement")
    ap.add_argument("--golden-reps", type=int, default=5)
    ap.add_argument("--antennas", type=int, default=16)
    ap.add_argument("--fft", type=int, default=1024)
    ap.add_argument("--cp", type=int, default=72)
    ap.add_argument("--symbols", type=int, default=101)
    ap.add_argument("--precision", default="high",
                    choices=["default", "high", "highest"])
    ap.add_argument("--pipeline", default="fused", choices=["fused", "fast"],
                    help="fused = whole-pipeline Pallas kernel (fp32-grade "
                         "bf16-split dots); fast = XLA fastpath at --precision")
    ap.add_argument("--kernel-precision", default="exact",
                    choices=["exact", "bf16"],
                    help="fused-kernel numerics: exact = fp32-grade bf16 "
                         "hi/lo-split dots (default); bf16 = plain-bf16 speed "
                         "mode (~1e-2 rel err, the demodCuBlas-style "
                         "accuracy/speed trade, gpuLS.cu:771-858)")
    ap.add_argument("--input", default="sc16", choices=["f32", "sc16"],
                    help="device input dtype.  DEFAULT sc16 (r3 decision, "
                         "docs/PERF.md): planar int16 IS the radio wire "
                         "format (UHD sc16) carried bit-exactly end to end "
                         "-- half the input DMA of f32 on an HBM-rate-bound "
                         "kernel, identical EVM, fused pipeline only.  f32 "
                         "replicates the reference's float ring for "
                         "apples-to-apples BASELINE comparisons.  Applies "
                         "to --mesh runs too (fused shard body); non-fused "
                         "pipelines use f32 regardless.")
    ap.add_argument("--mesh", default=None, metavar="ANTxTIME",
                    help="bench the SHARDED receiver over an (ant, time) "
                         "device mesh, e.g. 1x1 (hardware single chip) or "
                         "8x1 (virtual CPU mesh): antenna-sharded MRC with "
                         "one fused psum (the distributed form of the "
                         "reference's antenna tree-reduce, "
                         "gpuLS.cu:198-203,247-252).  Reports samples/s/chip "
                         "and the psum payload bytes/frame.")
    ap.add_argument("--sharded-entry", default="split",
                    choices=["split", "whole"],
                    help="--mesh input placement: 'split' pre-splits "
                         "(pilot, data); 'whole' places kernel-native whole "
                         "frames and slices the pilot in-shard (fused, cp=0, "
                         "time_shards=1)")
    ap.add_argument("--fuse-estimate", action="store_true",
                    help="compute the LS channel estimate INSIDE the fused "
                         "kernel (pilot row's stage-2 output at grid step 0 "
                         "-> VMEM scratch) instead of the separate XLA "
                         "pilot path")
    ap.add_argument("--record", default=None, metavar="FILE",
                    help="update a per-mode record file (BENCH_MODES.json): "
                         "a {mode: record} map keeping each mode's best "
                         "samples/s -- the ratchet tools/gate.py --modes "
                         "floors against (the committed analogue of the "
                         "reference's per-run storeTimes dumps, "
                         "ShMemSymBuff.hpp:166-189)")
    ap.add_argument("--cp-where", default="host", choices=["host", "device"],
                    help="host = cyclic prefix stripped during ingest, like "
                         "the reference (its ring drops the CP on host "
                         "copy-out, ShMemSymBuff.hpp:281-294, and its GPU "
                         "benchmark ran prefix=0, ShMemSymBuff_gpu.hpp:56); "
                         "device = CP-carrying frames sliced on-chip "
                         "(harder workload, counts CP samples in the metric)")
    args = ap.parse_args()

    if args.fuse_estimate and (args.mesh or args.pipeline != "fused"):
        # Fail loud: neither bench_sharded nor the non-fused paths have a
        # fuse_estimate program -- silently ignoring the flag would record
        # a mode claiming a variant that never ran.
        raise SystemExit("--fuse-estimate is a fused single-chip mode "
                         "(not --mesh / --pipeline fast)")

    if not wait_for_device():
        # Touching jax now would hang on the wedged claim; exiting with no
        # JSON line is the unambiguous failure the caller can act on.
        raise SystemExit("bench: TPU never became available "
                         "(stale chip claim or tunnel down)")

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

    if args.cp_where == "host":
        # Ring-style ingest: the host strips the CP during copy-out (native
        # ring semantics; reference ShMemSymBuff.hpp:281-294). The chip sees
        # CP-free symbols and the metric counts chip-touching samples.
        dev_frames = np.ascontiguousarray(frames[..., args.cp:])
        dev_cfg = FrameConfig(num_antennas=args.antennas, fft_size=args.fft,
                              cyclic_prefix=0, frame_len=args.symbols)
        samples_per_frame = cfg.frame_len * cfg.num_antennas * cfg.fft_size
    else:
        dev_frames, dev_cfg = frames, cfg
        samples_per_frame = cfg.frame_len * cfg.num_antennas * cfg.symbol_len

    def mode_name(input_dtype):
        parts = [input_dtype, args.kernel_precision
                 if args.pipeline == "fused" else args.pipeline]
        if args.antennas != 16:
            parts.append(f"{args.antennas}ant")
        if args.fft != 1024:
            parts.append(f"fft{args.fft}")
        if args.mesh:
            parts.append(f"mesh{args.mesh.lower()}")
        # Non-default program variants get their own record key -- otherwise
        # e.g. a `--sharded-entry whole` best would ratchet the split entry's
        # floor while gate.py replays the split program against it.
        if args.mesh and args.sharded_entry != "split":
            parts.append(args.sharded_entry)
        if args.fuse_estimate:
            parts.append("fuseest")
        if args.cp_where != "host":
            parts.append(f"cp{args.cp_where}")
        if args.cp != 72:
            parts.append(f"cp{args.cp}")
        return "-".join(parts)

    def record(rec, mode, input_dtype):
        rec = dict(rec, mode=mode)
        # Enough to re-run this exact mode (tools/gate.py --modes rebuilds
        # the CLI from these fields when checking each floor).
        rec["config"] = {"input": input_dtype,
                         "pipeline": args.pipeline,
                         "kernel_precision": args.kernel_precision,
                         "antennas": args.antennas, "fft": args.fft,
                         "symbols": args.symbols, "mesh": args.mesh,
                         "sharded_entry": args.sharded_entry,
                         "fuse_estimate": args.fuse_estimate,
                         "cp_where": args.cp_where, "cp": args.cp}
        print(json.dumps(rec))
        if args.record:
            import os
            book = {}
            if os.path.exists(args.record):
                with open(args.record) as fh:
                    book = json.load(fh)
            prev_best = book.get(mode, {}).get("best", 0.0)
            rec["best"] = max(prev_best, rec["value"])
            book[mode] = rec
            with open(args.record, "w") as fh:
                json.dump(book, fh, indent=1, sort_keys=True)
                fh.write("\n")

    # sc16 rides the fused kernel only; other pipelines take the f32 path
    # (the default is sc16 -- see --input help -- so downgrade with a note
    # instead of failing a plain `bench.py --pipeline fast` run).
    from ofdm_ls_mrc_tpu.ops.pallas_pipeline import supports_fused
    input_dtype = args.input
    if input_dtype == "sc16" and not (
            args.pipeline == "fused" and supports_fused(args.fft)
            and dev_cfg.cyclic_prefix == 0):
        import sys
        print(f"note: --input sc16 needs the fused kernel on CP-free "
              f"frames; this {args.pipeline}/fft={args.fft} run uses f32 "
              f"input", file=sys.stderr)
        input_dtype = "f32"

    if args.mesh:
        n_ant, n_time = (int(v) for v in args.mesh.lower().split("x"))
        t_tpu = bench_sharded(dev_cfg, pilot, dev_frames, args.reps,
                              (n_ant, n_time), pipeline=args.pipeline,
                              entry=args.sharded_entry,
                              input_dtype=input_dtype,
                              exact=(args.kernel_precision == "exact"))
        t_gold = bench_golden(cfg, pilot, frames[0], args.golden_reps)
        sps = samples_per_frame / t_tpu
        sps_gold = samples_per_frame / t_gold
        record({
            "metric": "ofdm_samples_per_sec_per_chip",
            "value": round(sps / (n_ant * n_time), 1),
            "unit": "samples/s",
            "vs_baseline": round(sps / sps_gold, 2),
            "mesh": f"{n_ant}x{n_time}",
            "total_samples_per_sec": round(sps, 1),
            "psum_payload_bytes_per_frame": psum_payload_bytes(dev_cfg, n_time),
        }, mode_name(input_dtype), input_dtype)
        return

    t_tpu = bench_tpu(dev_cfg, pilot, dev_frames, args.reps,
                      pipeline=args.pipeline,
                      exact=(args.kernel_precision == "exact"),
                      input_dtype=input_dtype,
                      fuse_estimate=args.fuse_estimate)
    t_gold = bench_golden(cfg, pilot, frames[0], args.golden_reps)

    sps = samples_per_frame / t_tpu
    sps_gold = samples_per_frame / t_gold
    record({
        "metric": "ofdm_samples_per_sec_per_chip",
        "value": round(sps, 1),
        "unit": "samples/s",
        "vs_baseline": round(sps / sps_gold, 2),
    }, mode_name(input_dtype), input_dtype)


if __name__ == "__main__":
    main()
