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
MODES_FILE = os.path.join(REPO, "BENCH_MODES.json")


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


def load_mode_book() -> dict:
    """The committed per-mode record book (bench.py --record)."""
    if os.path.exists(MODES_FILE):
        with open(MODES_FILE) as fh:
            return json.load(fh)
    return {}


def _run_bench(extra_args) -> dict:
    r = subprocess.run([sys.executable, "bench.py"] + extra_args, cwd=REPO,
                       capture_output=True, text=True)
    if r.returncode != 0:
        raise RuntimeError(f"bench.py {' '.join(extra_args)} failed:\n"
                           f"{r.stdout}{r.stderr}")
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
    if not lines:
        raise RuntimeError(f"bench.py printed no JSON line:\n{r.stdout}")
    return json.loads(lines[-1])


def _mode_cli(cfg: dict):
    out = ["--input", cfg["input"], "--pipeline", cfg["pipeline"],
           "--kernel-precision", cfg["kernel_precision"],
           "--antennas", str(cfg["antennas"]), "--fft", str(cfg["fft"]),
           "--symbols", str(cfg["symbols"])]
    if cfg.get("mesh"):
        out += ["--mesh", cfg["mesh"]]
    # Variant fields absent from pre-r3 records default to the bench
    # defaults they were recorded with.
    out += ["--sharded-entry", cfg.get("sharded_entry", "split")]
    if cfg.get("fuse_estimate"):
        out += ["--fuse-estimate"]
    out += ["--cp-where", cfg.get("cp_where", "host")]
    out += ["--cp", str(cfg.get("cp", 72))]
    return out


def gate_modes() -> int:
    """Per-mode ratcheting floors: every mode recorded in BENCH_MODES.json
    must stay within TUNNEL_MARGIN of its best recorded samples/s (VERDICT
    r2: the default-mode floor alone could not catch a regressed sc16 or
    64-antenna path)."""
    book = load_mode_book()
    if not book:
        print("[gate] no BENCH_MODES.json: run bench.py --record "
              "BENCH_MODES.json first", file=sys.stderr)
        return 1
    rc = 0
    for mode, entry in sorted(book.items()):
        floor = float(entry["best"]) * (1.0 - TUNNEL_MARGIN)
        try:
            rec = _run_bench(_mode_cli(entry["config"]))
        except RuntimeError as e:
            print(f"[gate] mode {mode}: {e}", file=sys.stderr)
            rc = 1
            continue
        ok = float(rec["value"]) >= floor
        print(f"[gate] mode {mode}: {rec['value']/1e9:.2f} Gs/s vs floor "
              f"{floor/1e9:.2f} (best {entry['best']/1e9:.2f} - "
              f"{TUNNEL_MARGIN*100:.0f}%): {'PASS' if ok else 'FAIL'}")
        rc |= 0 if ok else 1
    return rc


LATENCY_FILE = os.path.join(REPO, "LATENCY.json")


def gate_latency() -> int:
    """ts=1 latency ratchet: re-measure every body recorded in LATENCY.json
    (tools/latency_probe.py) and require each us/symbol to stay within
    TUNNEL_MARGIN of its best -- the low-latency analogue of gate_modes
    (latency ratchets DOWN, so the bound is best * (1 + margin))."""
    if not os.path.exists(LATENCY_FILE):
        print("[gate] no LATENCY.json: run tools/latency_probe.py --record "
              "LATENCY.json first", file=sys.stderr)
        return 1
    with open(LATENCY_FILE) as fh:
        book = json.load(fh)
    groups: dict = {}
    for key, e in book.items():
        gk = (e["config"]["antennas"], e["config"]["fft"])
        groups.setdefault(gk, set()).add(e["body"])
    rc = 0
    for (a, f), bodies in sorted(groups.items()):
        with tempfile.TemporaryDirectory() as td:
            tmp = os.path.join(td, "lat.json")
            r = subprocess.run(
                [sys.executable, os.path.join("tools", "latency_probe.py"),
                 "--bodies", ",".join(sorted(bodies)),
                 "--antennas", str(a), "--fft", str(f), "--record", tmp],
                cwd=REPO, capture_output=True, text=True)
            if r.returncode != 0:
                print(f"[gate] latency probe ({a}ant fft{f}) failed:\n"
                      f"{r.stdout}{r.stderr}", file=sys.stderr)
                rc = 1
                continue
            with open(tmp) as fh:
                new = json.load(fh)
        for key, e in new.items():
            if key not in book:
                continue
            ceil = float(book[key]["best"]) * (1.0 + TUNNEL_MARGIN)
            v = float(e["value"])
            ok = v <= ceil
            print(f"[gate] latency {key}: {v:.2f} us vs ceiling {ceil:.2f} "
                  f"(best {book[key]['best']:.2f} + {TUNNEL_MARGIN*100:.0f}%):"
                  f" {'PASS' if ok else 'FAIL'}")
            rc |= 0 if ok else 1
    return rc


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
    rc = r.returncode

    # Every OTHER shipped body (VERDICT r4 Weak #4 / Next #5): the sweep
    # covers {fused, fast, composed} x {whole, streaming} unsharded on the
    # ambient backend, and the sharded bodies (whole 2x2, per-symbol 2x1)
    # on a forced 8-device CPU mesh (single-chip hardware cannot host one).
    for legs in ([], ["--mesh-legs"]):
        sw = subprocess.run(
            [sys.executable, os.path.join("tools", "accuracy_sweep.py")]
            + legs, cwd=REPO, env={**os.environ})
        name = "sharded bodies (cpu mesh)" if legs else "unsharded bodies"
        print(f"[gate] accuracy sweep, {name}: "
              f"{'PASS' if sw.returncode == 0 else 'FAIL'}")
        rc |= sw.returncode
    return rc


def gate_perf() -> int:
    """Default-mode throughput floor: the floor comes from the matching
    entry in BENCH_MODES.json when one exists (ratchet), else from the
    driver-recorded BENCH_r* artifacts."""
    try:
        rec = _run_bench([])
    except RuntimeError as e:
        print(f"[gate] {e}", file=sys.stderr)
        return 1
    sps = float(rec["value"])
    mode = rec.get("mode", "?")
    entry = load_mode_book().get(mode)
    best = float(entry["best"]) if entry else recorded_best_sps()
    src = f"mode record {mode!r}" if entry else "BENCH_r* driver records"
    floor = best * (1.0 - TUNNEL_MARGIN)
    ok = sps >= floor
    print(f"[gate] throughput ({mode}): {sps/1e9:.2f} Gs/s vs floor "
          f"{floor/1e9:.2f} (best {best/1e9:.2f} from {src} - "
          f"{TUNNEL_MARGIN*100:.0f}% margin): {'PASS' if ok else 'FAIL'}")
    return 0 if ok else 1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-perf", action="store_true",
                    help="accuracy gate only (no TPU throughput floor)")
    ap.add_argument("--skip-accuracy", action="store_true")
    ap.add_argument("--modes", action="store_true",
                    help="also re-run EVERY mode recorded in "
                         "BENCH_MODES.json against its ratcheting floor "
                         "(slow: one bench per mode, needs the TPU)")
    ap.add_argument("--latency", action="store_true",
                    help="also re-measure every ts=1 body recorded in "
                         "LATENCY.json against its ratcheting ceiling "
                         "(needs the TPU)")
    args = ap.parse_args()

    rc = 0
    if not args.skip_accuracy:
        rc |= gate_accuracy()
    if not args.skip_perf:
        rc |= gate_perf()
    if args.modes:
        rc |= gate_modes()
    if args.latency:
        rc |= gate_latency()
    print(f"[gate] {'ALL PASS' if rc == 0 else 'REGRESSION DETECTED'}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
