"""Producer/consumer shared-memory ring: the reference's runtime topology.

Spawns a producer PROCESS (the rx_and_corr.cpp role: strips the cyclic
prefix and writes symbols into the POSIX shm ring) and consumes them in
this process through
RingFeed -> UplinkReceiver (the cpuLS_main.cpp / gpuLS_main.cu role).
Demonstrates master/slave attach, native CP-drop + planar deinterleave on
copy-out, the double-buffered reader thread, and a clean drain/shutdown
handshake.

  python examples/02_ring_pipeline.py [--platform cpu]
"""

import argparse
import multiprocessing as mp
import os
import sys
import tempfile
import uuid

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Unique per run: concurrent invocations (another user, a parallel test
# runner) must not attach to each other's segment or pilot file.
RING_UID = f"/ofdm_example_{uuid.uuid4().hex[:8]}"
PILOT_PATH = os.path.join(tempfile.gettempdir(),
                          f"ofdm_example_pilot_{uuid.uuid4().hex[:8]}.npy")


def tx_grid(frame_idx: int, cfg, scheme="qpsk"):
    """Deterministic per-frame TX grid so producer and consumer can agree on
    the sent data without sharing state (frame identity is not on the wire,
    matching the reference)."""
    from ofdm_ls_mrc_tpu.sim import random_symbols

    return random_symbols(np.random.default_rng(5000 + frame_idx),
                          (cfg.num_data_symbols, cfg.num_subcarriers),
                          scheme)[0]


def produce(uid: str, pilot_path: str, frames: int, seed: int,
            snr_db: float) -> None:
    """Producer process: synthesize frames and write them symbol-bursts at a
    time, like the RX app's writer thread (rx_and_corr.cpp:64-87)."""
    from ofdm_ls_mrc_tpu import FrameConfig
    from ofdm_ls_mrc_tpu.io.ring import SymbolRing
    from ofdm_ls_mrc_tpu.sim import ChannelModel, make_tx_frame

    cfg = FrameConfig(num_antennas=4, fft_size=256, cyclic_prefix=32,
                      frame_len=9)
    rng = np.random.default_rng(seed)
    pilot = np.exp(2j * np.pi * rng.random(cfg.num_subcarriers)
                   ).astype(np.complex64)
    np.save(pilot_path, pilot)
    chan = ChannelModel(cfg.num_antennas, cfg.fft_size, num_taps=8,
                        snr_db=snr_db, seed=seed)
    # Master creates the segment; the writer strips the CP before the ring,
    # exactly like the reference's RX writer thread (rx_and_corr.cpp:71-84),
    # so slots hold CP-free [A, F] symbols.
    with SymbolRing(uid, cfg.num_antennas, cfg.fft_size, length=32,
                    master=True, timeout=30.0) as ring:
        for i in range(frames):
            data = tx_grid(i, cfg)
            rx = chan.apply(make_tx_frame(data, pilot, cfg.cyclic_prefix),
                            cfg.cyclic_prefix)      # [S, A, F+cp]
            ring.write_batch(np.ascontiguousarray(
                rx[:, :, cfg.cyclic_prefix:]))      # one native call per frame
        ring.wait_drained(timeout=30.0)
        ring.shutdown()


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--frames", type=int, default=4)
    args = ap.parse_args(argv)
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from ofdm_ls_mrc_tpu import FrameConfig
    from ofdm_ls_mrc_tpu.io.feed import RingFeed
    from ofdm_ls_mrc_tpu.io.ring import SymbolRing
    from ofdm_ls_mrc_tpu.models import UplinkReceiver
    from ofdm_ls_mrc_tpu.sim import evm_db

    proc = mp.get_context("spawn").Process(
        target=produce, args=(RING_UID, PILOT_PATH, args.frames, 11, 28.0),
        daemon=True)
    proc.start()

    # Ring symbols are already CP-free, so the receiver runs cyclic_prefix=0
    # (the demod processes' own geometry -- ShMemSymBuff.hpp:46 prefix=0).
    cfg = FrameConfig(num_antennas=4, fft_size=256, cyclic_prefix=0,
                      frame_len=9)
    # Slave attaches to the producer's segment (cpuLS_main.cpp:76 role).
    with SymbolRing(RING_UID, cfg.num_antennas, cfg.symbol_len, length=32,
                    master=False, timeout=30.0) as ring:
        feed = RingFeed(ring, cfg)   # reader thread + rotating host buffers
        rx = None
        got, worst_evm = 0, -1000.0
        for frame in feed.frames(max_frames=args.frames):  # CArray on device
            if rx is None:
                pilot = np.load(PILOT_PATH)
                rx = UplinkReceiver(cfg, pilot)
            out = rx.demod_frame(frame).to_numpy()
            evm = evm_db(np.fft.fftshift(out, axes=-1), tx_grid(got, cfg))
            worst_evm = max(worst_evm, evm)
            got += 1
            print(f"frame {got}: {out.shape[0]} symbols, EVM {evm:.1f} dB")
        feed.stop()
        print(ring.info())

    proc.join(timeout=30)
    if os.path.exists(PILOT_PATH):
        os.unlink(PILOT_PATH)
    ok = got == args.frames and worst_evm < -25.0
    print("OK" if ok else f"FAIL: {got}/{args.frames} frames")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
