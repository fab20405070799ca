"""Worker for the 2-process demod_app --distributed test.

Each process is one 'host': it owns a local ring master carrying ITS
antennas' symbols (all frame slots), launches a producer thread, and runs
the real demod_app CLI in --distributed mode against the shared
jax.distributed coordinator.  Process 0 verifies the output file against
the NumPy golden.  Env: MH_COORD, MH_NPROC, MH_PID, DAPP_UID, DAPP_DIR.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main() -> int:
    import threading

    from ofdm_ls_mrc_tpu.apps import demod_app
    from ofdm_ls_mrc_tpu.golden import dsp
    from ofdm_ls_mrc_tpu.golden.io import pilot_shift, read_output, write_pilot
    from ofdm_ls_mrc_tpu.io.ring import SymbolRing

    pid = int(os.environ["MH_PID"])
    nproc = int(os.environ["MH_NPROC"])
    uid = f"{os.environ['DAPP_UID']}_{pid}"
    d = os.environ["DAPP_DIR"]
    out_path = os.path.join(d, "Output_dist.dat")
    pilot_path = os.path.join(d, f"Pilots_{pid}.dat")

    a_glob = 8
    f = int(os.environ.get("DAPP_FFT", "64"))
    s = int(os.environ.get("DAPP_S", "9"))
    sc16 = os.environ.get("DAPP_SC16") == "1"
    continuous = os.environ.get("DAPP_CONT") == "1"
    cp, k = 8, 2
    rng = np.random.default_rng(321)  # same seed in both processes
    pilot_raw = np.exp(2j * np.pi * rng.random(f - 1)).astype(np.complex64)
    write_pilot(pilot_path, pilot_raw)
    frames = (0.1 * (rng.standard_normal((k, s, a_glob, f + cp))
                     + 1j * rng.standard_normal((k, s, a_glob, f + cp)))
              ).astype(np.complex64)

    a_local = a_glob // nproc
    w = SymbolRing(uid, a_local, f + cp, s, master=True, timeout=60.0,
                   dtype="sc16" if sc16 else "complex64")
    errs = []

    def produce():
        try:
            for ki in range(k):
                for si in range(s):
                    w.write(frames[ki, si,
                                   pid * a_local:(pid + 1) * a_local])
            if continuous:
                # Continuous consumers (--num-frames 0) end on the ring's
                # shutdown sentinel; drain first so nothing is lost.
                w.wait_drained(60.0)
                w.shutdown()
        except BaseException as e:
            errs.append(e)

    t = threading.Thread(target=produce)
    t.start()
    try:
        rc = demod_app.main([
            "--distributed", os.environ["MH_COORD"],
            "--num-processes", str(nproc), "--process-id", str(pid),
            "--antennas", str(a_glob), "--fft-size", str(f),
            "--cp-size", str(cp), "--frame-len", str(s),
            "--num-frames", "0" if continuous else str(k), "--shm-uid", uid,
            "--pilots", pilot_path, "--output", out_path,
            "--timeout", "60",
            # dd-EVM on random (non-constellation) payloads is meaningless
            # numerically; passing it here proves the metric path runs
            # under --distributed (rank 0 prints the summary line).
            "--link-quality", "qpsk",
        ] + (["--ring-dtype", "sc16", "--sc16-native"] if sc16 else []))
        t.join(timeout=30)
        if errs:
            raise errs[0]
        assert rc == 0, f"demod_app rc={rc}"
    finally:
        w.close()

    if pid == 0:
        pilot = pilot_shift(pilot_raw)
        got = read_output(out_path, f - 1)
        if sc16:
            from ofdm_ls_mrc_tpu.golden.io import (SC16_FULL_SCALE,
                                                   complex_to_sc16)
            q = complex_to_sc16(frames.reshape(-1, f + cp)).astype(np.float32)
            frames = ((q[:, ::2] + 1j * q[:, 1::2]) / SC16_FULL_SCALE
                      ).astype(np.complex64).reshape(frames.shape)
        want = np.concatenate(
            [dsp.demod_frame(frames[ki], pilot, cp) for ki in range(k)])
        err = np.max(np.abs(got - want)) / np.max(np.abs(want))
        print(f"[proc 0] app-distributed rel err vs golden: {err:.2e}",
              flush=True)
        assert err < 3e-3, err
        # Merged provenance index: one clean line per frame, contiguous
        # row ranges, writer frame ordinals 0..k-1, dd-EVM column present.
        idx = [ln.split() for ln in
               open(out_path + ".index").read().splitlines()]
        assert len(idx) == k, idx
        for i, ln in enumerate(idx):
            assert int(ln[0]) == i and ln[1] == "clean", ln
            assert (int(ln[2]), int(ln[3])) == (i * (s - 1),
                                                (i + 1) * (s - 1)), ln
            assert int(ln[4]) == i, ln
            assert len(ln) == 6, ln
        print("[proc 0] merged index OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
