"""RX ingest process: IQ source -> PN frame sync -> shm ring (master).

The hardware-free replacement for the reference's UHD receive app
(rx_and_corr.cpp:89-437): keeps its CLI surface (--rate/--freq/--gain/
--channels/--frame-size/--thres/--cp-size, rx_and_corr.cpp:100-121), its PN
sliding-correlator frame synchronization (rx_and_corr.cpp:332-360), its
double-buffered stitch (rx_and_corr.cpp:372-393) and its ring-master role
(mode 1, rx_and_corr.cpp:52) -- but sources samples from an IQ capture file
or the built-in channel simulator instead of a USRP.

Run:  python -m ofdm_ls_mrc_tpu.apps.rx_app --file capture.dat --antennas 16 \\
          --fft-size 1024 --cp-size 72 --frame-len 101
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description=__doc__)
    # Reference CLI surface (hardware params accepted and logged; no UHD here).
    ap.add_argument("--rate", type=float, default=1e6, help="sample rate (sps)")
    ap.add_argument("--freq", type=float, default=0.0, help="RF center frequency")
    ap.add_argument("--gain", type=float, default=0.0, help="RF gain")
    ap.add_argument("--channels", default="0", help="channel list (informational)")
    ap.add_argument("--frame-size", type=int, default=1024,
                    help="samples per receive buffer (num_samps)")
    ap.add_argument("--thres", type=float, default=0.1,
                    help="PN correlator threshold")
    ap.add_argument("--cp-size", type=int, default=72)
    ap.add_argument("--file-prefix", default="corr_rec",
                    help="prefix for aligned/raw capture dumps")
    # Framework-specific source + ring config.
    ap.add_argument("--file", default=None,
                    help="IQ capture: complex64 binary, [antennas, samples] "
                         "C-order (or 1-D for one antenna)")
    ap.add_argument("--pn-file", default="PNSeq_255_MaxLenSeq.dat")
    ap.add_argument("--no-sync", action="store_true",
                    help="skip PN correlation; treat input as frame-aligned")
    ap.add_argument("--antennas", type=int, default=16)
    ap.add_argument("--fft-size", type=int, default=1024)
    ap.add_argument("--frame-len", type=int, default=101,
                    help="symbols per frame incl. pilot")
    ap.add_argument("--shm-uid", default="/ofdm_ring")
    ap.add_argument("--num-frames", type=int, default=1,
                    help="frames to stream; 0 = continuous file-player mode "
                         "(cycle the capture until SIGINT/reader shutdown)")
    ap.add_argument("--wait-writes", action="store_true",
                    help="backpressured writes (default: no-wait like live RX)")
    ap.add_argument("--dump-aligned", action="store_true",
                    help="dump aligned captures per channel like the reference")
    ap.add_argument("--dump-raw", action="store_true",
                    help="dump the raw pre-sync capture per channel (the "
                         "reference's raw ring-capture dump, "
                         "rx_and_corr.cpp:411-427)")
    ap.add_argument("--file-format", default="cf32",
                    choices=["cf32", "sc16"],
                    help="capture file sample format: cf32 = complex64, "
                         "sc16 = interleaved int16 IQ (USRP wire format)")
    ap.add_argument("--ring-dtype", default="complex64",
                    choices=["complex64", "sc16"],
                    help="shm element format; sc16 halves ring bandwidth "
                         "(USRP wire format)")
    ap.add_argument("--timeout", type=float, default=30.0)
    return ap


def load_capture(path: str, antennas: int, fmt: str = "cf32") -> np.ndarray:
    if fmt == "sc16":
        from ..golden.io import sc16_to_complex
        raw = sc16_to_complex(np.fromfile(path, dtype=np.int16))
    else:
        raw = np.fromfile(path, dtype=np.complex64)
    if antennas == 1:
        return raw.reshape(1, -1)
    if raw.size % antennas:
        raise ValueError(f"{path}: {raw.size} samples not divisible by "
                         f"{antennas} antennas")
    return raw.reshape(antennas, -1)


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from ..golden.io import load_pn_sequence
    from ..io.ring import RingShutdown, SymbolRing
    from ..sim.pn import correlate_frame_start

    print(f"RX config: rate={args.rate/1e6:.3f} Msps freq={args.freq/1e6:.3f} MHz "
          f"gain={args.gain} dB channels={args.channels}")

    if args.file is None:
        print("no --file given: nothing to play", file=sys.stderr)
        return 2

    samples = load_capture(args.file, args.antennas, args.file_format)  # [A, N]
    sym_len = args.fft_size + args.cp_size
    frame_samps = args.frame_len * sym_len

    # Frame synchronization: slide the PN correlator over antenna 0 (the
    # reference scans channels in order and stops at the first hit,
    # rx_and_corr.cpp:333-359).
    if args.no_sync:
        start = 0
    else:
        pn = load_pn_sequence(args.pn_file)
        start, peak = correlate_frame_start(samples[0], pn, args.thres)
        if start < 0:
            print(f"no PN peak above thres={args.thres} (max {peak:.4f})",
                  file=sys.stderr)
            return 1
        print(f"PN sync: start={start} peak={peak:.4f}")
        start += pn.size  # payload begins after the preamble

    ring = SymbolRing(args.shm_uid, args.antennas, sym_len, args.frame_len,
                      master=True, timeout=args.timeout, dtype=args.ring_dtype)
    print(f"ring master up: uid={args.shm_uid} "
          f"[{args.antennas} x {sym_len}] x {args.frame_len}")

    # --num-frames 0: continuous file-player mode -- cycle the capture until
    # SIGINT or reader shutdown (the reference RX runs `while !stop_signal`,
    # rx_and_corr.cpp:296,305).
    avail_frames = (samples.shape[1] - start) // frame_samps
    if avail_frames < 1:
        print("capture shorter than one frame after sync", file=sys.stderr)
        ring.close()
        return 1
    continuous = args.num_frames <= 0

    wrote = 0
    frames_sent = 0
    try:
        f = 0
        while continuous or f < args.num_frames:
            base = start + (f % avail_frames if continuous else f) * frame_samps
            if not continuous and base + frame_samps > samples.shape[1]:
                print(f"capture exhausted after {f} frame(s)")
                break
            for s in range(args.frame_len):
                sym = samples[:, base + s * sym_len: base + (s + 1) * sym_len]
                ring.write(np.ascontiguousarray(sym), wait=args.wait_writes,
                           timeout=args.timeout)
                wrote += 1
            frames_sent += 1
            f += 1
        if args.dump_aligned:
            dump_frames = min(frames_sent, avail_frames)  # continuous mode cycles
            for ch in range(args.antennas):
                out = f"{args.file_prefix}_ch_{ch}_binary"
                samples[ch, start:start + dump_frames * frame_samps].tofile(out)
        if args.dump_raw:
            for ch in range(args.antennas):
                samples[ch].tofile(f"{args.file_prefix}_raw_ch_{ch}_binary")
        print(f"wrote {wrote} symbols ({frames_sent} frame(s)), "
              f"dropped={ring.dropped}")
    except KeyboardInterrupt:
        print(f"SIGINT: stopping after {frames_sent} frame(s), "
              f"{wrote} symbols, dropped={ring.dropped}")
    except RingShutdown:
        print(f"reader shut the ring down after {frames_sent} frame(s)")
    finally:
        # Teardown handshake: wait for the slave to drain before unlinking
        # the segment (the reference's destructor sentinel dance,
        # ShMemSymBuff.hpp:221-230, minus the infinite spin).
        if not ring.wait_drained(args.timeout):
            print("warning: reader did not drain the ring before timeout",
                  file=sys.stderr)
        ring.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
