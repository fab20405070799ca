"""TX process: modulate frames (+ optional PN preamble) to an IQ capture.

The hardware-free replacement for the reference's UHD transmit app
(tx_same_seq_no_udp.cpp:84-445): keeps its CLI surface (--rate/--freq/
--gain/--channels/--same-time, tx_same_seq_no_udp.cpp:95-117) and its
optional PN-preamble prepend (tx_same_seq_no_udp.cpp:255-267,300-308), but
"transmits" into a complex64 capture file (optionally through the synthetic
multipath channel) that rx_app plays back -- closing the reference's
TX -> air -> RX loop without radios.

Run:  python -m ofdm_ls_mrc_tpu.apps.tx_app --out capture.dat --antennas 16 \\
          --fft-size 1024 --cp-size 72 --frame-len 101 --snr 25
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    from ..sim.channel import CONSTELLATIONS
    ap = argparse.ArgumentParser(description=__doc__)
    # Reference CLI surface (tx_same_seq_no_udp.cpp:94-121).  rate/freq/
    # gain/bw accept per-channel comma lists; scalars broadcast like the
    # reference's per-channel loop (tx_same_seq_no_udp.cpp:169-192).
    ap.add_argument("--rate", default="1e6",
                    help="sample rate (sps), scalar or per-channel list")
    ap.add_argument("--freq", default="0.0",
                    help="RF center frequency (Hz), scalar or per-channel list")
    ap.add_argument("--gain", default="0.0",
                    help="RF gain (dB), scalar or per-channel list")
    ap.add_argument("--bw", default="0.0",
                    help="frontend bandwidth (Hz), scalar or per-channel list")
    ap.add_argument("--ant", default=None,
                    help="antenna selection (informational)")
    ap.add_argument("--channels", default=None,
                    help="TX channel list, e.g. '0' or '0,1' (default: one "
                         "channel; with --snr the channel-sim output already "
                         "spans --antennas rows)")
    ap.add_argument("--same-time", action="store_true",
                    help="duplicate the stream across channels; without it a "
                         "multi-channel file is PARTITIONED across channels "
                         "(reference --same-time, "
                         "tx_same_seq_no_udp.cpp:269-298)")
    # Framework-specific.
    ap.add_argument("--out", required=True, help="output IQ capture file")
    ap.add_argument("--out-format", default="cf32", choices=["cf32", "sc16"],
                    help="capture sample format: cf32 = complex64, sc16 = "
                         "interleaved int16 IQ (clipped to full scale)")
    ap.add_argument("--in-file", default=None,
                    help="optional subcarrier data file (complex64, rows of "
                         "F-1); default: random QPSK")
    ap.add_argument("--data-out", default=None,
                    help="write the sent subcarrier data for EVM checks")
    ap.add_argument("--antennas", type=int, default=16,
                    help="RX antennas to simulate when --snr is given")
    ap.add_argument("--fft-size", type=int, default=1024)
    ap.add_argument("--cp-size", type=int, default=72)
    ap.add_argument("--frame-len", type=int, default=101)
    ap.add_argument("--num-frames", type=int, default=1)
    ap.add_argument("--pilots", default="Pilots.dat")
    ap.add_argument("--pn-file", default="PNSeq_255_MaxLenSeq.dat")
    ap.add_argument("--pn-preamble", action="store_true",
                    help="prepend the PN sequence before the first frame")
    ap.add_argument("--pn-every-frame", action="store_true",
                    help="prepend the PN before EVERY frame -- the stream "
                         "shape of the reference's continuous TX, which "
                         "re-sends its PN+payload buffer in a timed loop "
                         "(tx_same_seq_no_udp.cpp:255-267,415-419); required "
                         "for rx_app --continuous-sync re-acquisition")
    ap.add_argument("--snr", type=float, default=None,
                    help="run through the synthetic multipath channel at this "
                         "SNR (dB); output becomes [antennas, N]")
    ap.add_argument("--channel-taps", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--modulation", default="qpsk", choices=sorted(CONSTELLATIONS))
    return ap


def _channelize(stream, args, n_ch: int) -> "np.ndarray":
    """Map one TX stream onto channels: --same-time duplicates it per
    channel; an explicit multi-channel list without --same-time PARTITIONS
    it evenly (the reference splits its IQ file across channels,
    tx_same_seq_no_udp.cpp:269-298).  Without --channels the legacy shape
    is kept (1 row, or --antennas rows under --same-time)."""
    rows = n_ch if args.channels else (args.antennas if args.same_time else 1)
    if rows == 1:
        return stream.reshape(1, -1)
    if args.same_time or not args.channels:
        return np.broadcast_to(stream, (rows, stream.size))
    per = stream.size // rows
    if stream.size % rows:
        print(f"warning: partitioning truncates {stream.size % rows} "
              f"trailing sample(s) ({stream.size} not divisible by "
              f"{rows} channels)", file=sys.stderr)
    return stream[: per * rows].reshape(rows, per)


def _write_capture(arr: np.ndarray, path: str, fmt: str) -> None:
    """Write complex64 samples as cf32 or clipped full-scale sc16."""
    c = np.ascontiguousarray(arr, dtype=np.complex64)
    if fmt == "sc16":
        from ..golden.io import complex_to_sc16
        complex_to_sc16(c).tofile(path)
    else:
        c.tofile(path)


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from ..golden.io import load_pilot, load_pn_sequence
    from ..sim.channel import ChannelModel, make_tx_frame, random_symbols
    from ._cli import log_channel_config, parse_channels, per_channel

    chan_ids = parse_channels(args.channels, 256) if args.channels else [0]
    n_ch = len(chan_ids)
    log_channel_config("TX", chan_ids,
                       per_channel(args.rate, n_ch, "--rate"),
                       per_channel(args.freq, n_ch, "--freq"),
                       per_channel(args.gain, n_ch, "--gain"),
                       per_channel(args.bw, n_ch, "--bw"), args.ant)

    rng = np.random.default_rng(args.seed)
    f = args.fft_size
    pilot = load_pilot(args.pilots, f - 1)

    in_data = None
    if args.in_file:
        # Read ONCE; frame k takes the k-th frame's worth of samples,
        # cycling when the file holds fewer than --num-frames frames (the
        # reference also loops its IQ file, tx_same_seq_no_udp.cpp:269-298).
        in_data = np.fromfile(args.in_file, dtype=np.complex64)
        need = (args.frame_len - 1) * (f - 1)
        if in_data.size < need:
            raise SystemExit(
                f"{args.in_file}: {in_data.size} samples < one frame's "
                f"{need} ((frame_len-1) x (fft_size-1)); short frames "
                "would misalign the stream")
        in_frames = in_data.size // need
        if in_frames < args.num_frames:
            tail = " (trailing partial frame ignored)" if in_data.size % need else ""
            print(f"note: {args.in_file} holds {in_frames} whole frame(s); "
                  f"cycling them for --num-frames {args.num_frames}{tail}",
                  file=sys.stderr)
        in_data = in_data[: in_frames * need].reshape(in_frames, -1, f - 1)

    frames = []
    sent = []
    for k in range(args.num_frames):
        if in_data is not None:
            data = in_data[k % in_data.shape[0]]
        else:
            data, _ = random_symbols(rng, (args.frame_len - 1, f - 1),
                                     args.modulation)
        sent.append(data)
        frames.append(make_tx_frame(data, pilot, args.cp_size))  # [S, F+cp]
    pn = (load_pn_sequence(args.pn_file).astype(np.complex64)
          if (args.pn_preamble or args.pn_every_frame) else None)

    if args.pn_every_frame:
        # [PN][frame][PN][frame]... -- the reference's continuous-TX stream
        # shape.  With --snr, each frame passes through the (fixed-tap)
        # multipath channel per frame while the PN chunks pass through a
        # flat unit channel (sync only), mirroring the single-preamble path.
        if args.snr is not None:
            chan = ChannelModel(args.antennas, f, num_taps=args.channel_taps,
                                snr_db=args.snr, seed=args.seed + 1)
            pn_part = np.broadcast_to(pn, (args.antennas, pn.size))
            chunks = []
            for fr in frames:
                rx = chan.apply(fr, args.cp_size)        # [S, A, sym]
                chunks.append(pn_part)
                chunks.append(np.swapaxes(rx, 0, 1).reshape(args.antennas, -1))
            _write_capture(np.concatenate(chunks, axis=1), args.out,
                           args.out_format)
        else:
            stream = np.concatenate(
                [np.concatenate([pn, fr.reshape(-1)]) for fr in frames])
            _write_capture(_channelize(stream, args, n_ch), args.out,
                           args.out_format)
        if args.data_out:
            np.concatenate(sent).astype(np.complex64).tofile(args.data_out)
        print(f"TX: wrote {args.out} "
              f"({args.num_frames} frame(s), pn_every_frame=True, "
              f"snr={args.snr})")
        return 0

    stream = np.concatenate([fr.reshape(-1) for fr in frames])   # single stream

    if args.pn_preamble:
        stream = np.concatenate([pn, stream])

    if args.snr is not None:
        # Through the multipath channel: one TX stream -> A antenna streams.
        sym_len = f + args.cp_size
        pre = stream.size % sym_len  # PN preamble isn't symbol-aligned
        body = stream[pre:].reshape(-1, sym_len)
        chan = ChannelModel(args.antennas, f, num_taps=args.channel_taps,
                            snr_db=args.snr, seed=args.seed + 1)
        rx = chan.apply(body, args.cp_size)              # [S_total, A, sym]
        out = np.swapaxes(rx, 0, 1).reshape(args.antennas, -1)
        if pre:
            # Preamble passes through a flat unit channel (sync only).
            pn_part = np.broadcast_to(stream[:pre], (args.antennas, pre))
            out = np.concatenate([pn_part, out], axis=1)
        _write_capture(out, args.out, args.out_format)
    else:
        _write_capture(_channelize(stream, args, n_ch), args.out,
                       args.out_format)

    if args.data_out:
        np.concatenate(sent).astype(np.complex64).tofile(args.data_out)
    print(f"TX: wrote {args.out} "
          f"({args.num_frames} frame(s), pn_preamble={args.pn_preamble}, "
          f"snr={args.snr})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
