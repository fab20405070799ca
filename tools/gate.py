"""CI regression gates (SURVEY.md section 7 step 8): one command, nonzero
exit on EVM or throughput regression.

Gate 1 -- accuracy: demodulate a synthetic 25 dB-SNR frame with the shipped
pipeline and with the NumPy golden (the cpuLS stand-in), dump both in the
reference's Output_*.dat layout, and compare through compare_app (the
reference's own golden-file verification workflow, cpuLS.hpp:374-380) at a
-70 dB EVM threshold -- two orders of magnitude tighter than the -40 dB
BASELINE contract, loose enough for fp32-grade kernel noise (~-95 dB).

Gate 2 -- throughput: run bench.py and require samples/s/chip above a floor
derived from the driver-recorded BENCH artifact (best recorded round) minus
a 20% tunnel margin (sessions swing 10-15%, docs/PERF.md).

Usage:
  python tools/gate.py               # both gates (needs the TPU)
  python tools/gate.py --skip-perf   # accuracy only (any backend)
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)

FALLBACK_FLOOR_SPS = 24.75e9   # BENCH_r01 driver record
TUNNEL_MARGIN = 0.20
EVM_THRESHOLD_DB = -70.0


def recorded_best_sps() -> float:
    best = 0.0
    for path in glob.glob(os.path.join(REPO, "BENCH_r*.json")):
        try:
            rec = json.load(open(path))
            v = float(rec.get("parsed", {}).get("value", 0.0))
            best = max(best, v)
        except Exception:
            continue
    return best or FALLBACK_FLOOR_SPS


def gate_accuracy() -> int:
    import numpy as np

    from ofdm_ls_mrc_tpu import FrameConfig
    from ofdm_ls_mrc_tpu.golden import dsp
    from ofdm_ls_mrc_tpu.golden.io import append_output
    from ofdm_ls_mrc_tpu.models import UplinkReceiver
    from ofdm_ls_mrc_tpu.sim import ChannelModel, make_tx_frame, random_symbols

    rng = np.random.default_rng(7)
    cfg = FrameConfig(num_antennas=16, fft_size=1024, cyclic_prefix=72,
                      frame_len=101)
    data, _ = random_symbols(rng, (cfg.num_data_symbols, cfg.num_subcarriers),
                             "16qam")
    pilot = np.exp(2j * np.pi * rng.random(cfg.num_subcarriers)
                   ).astype(np.complex64)
    frame = ChannelModel(16, 1024, num_taps=16, snr_db=25.0, seed=9).apply(
        make_tx_frame(data, pilot, 72), 72)

    rx = UplinkReceiver(cfg, pilot)
    got = rx.demod_frame(frame).to_numpy()
    gold = dsp.demod_frame(frame, pilot, 72)

    with tempfile.TemporaryDirectory() as td:
        a, b = os.path.join(td, "gold.dat"), os.path.join(td, "tpu.dat")
        append_output(a, gold, truncate=True)
        append_output(b, got, truncate=True)
        r = subprocess.run(
            [sys.executable, "-m", "ofdm_ls_mrc_tpu.apps.compare_app", a, b,
             "--subcarriers", str(cfg.num_subcarriers),
             "--threshold-db", str(EVM_THRESHOLD_DB)],
            cwd=REPO, env={**os.environ})
    print(f"[gate] accuracy ({rx.pipeline} pipeline vs golden, "
          f"{EVM_THRESHOLD_DB:.0f} dB): "
          f"{'PASS' if r.returncode == 0 else 'FAIL'}")
    return r.returncode


def gate_perf() -> int:
    floor = recorded_best_sps() * (1.0 - TUNNEL_MARGIN)
    r = subprocess.run([sys.executable, "bench.py"], cwd=REPO,
                       capture_output=True, text=True)
    if r.returncode != 0:
        print(f"[gate] bench.py failed:\n{r.stdout}{r.stderr}",
              file=sys.stderr)
        return 1
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
    if not lines:
        print(f"[gate] bench.py printed no JSON line:\n{r.stdout}",
              file=sys.stderr)
        return 1
    sps = float(json.loads(lines[-1])["value"])
    ok = sps >= floor
    print(f"[gate] throughput: {sps/1e9:.2f} Gs/s vs floor {floor/1e9:.2f} "
          f"(best recorded {recorded_best_sps()/1e9:.2f} - "
          f"{TUNNEL_MARGIN*100:.0f}% margin): {'PASS' if ok else 'FAIL'}")
    return 0 if ok else 1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-perf", action="store_true",
                    help="accuracy gate only (no TPU throughput floor)")
    ap.add_argument("--skip-accuracy", action="store_true")
    args = ap.parse_args()

    rc = 0
    if not args.skip_accuracy:
        rc |= gate_accuracy()
    if not args.skip_perf:
        rc |= gate_perf()
    print(f"[gate] {'ALL PASS' if rc == 0 else 'REGRESSION DETECTED'}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
