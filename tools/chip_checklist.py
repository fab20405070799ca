"""One-command chip-return checklist: everything pending on TPU hardware.

Axon outages last hours (docs/PERF.md); when the chip returns, the
highest-value measurements must run FIRST in case it vanishes again.
This orchestrator runs the standing hardware checklist in priority
order, continues past individual failures, ratchets the committed
record books (BENCH_MODES.json / LATENCY.json), and writes one JSON
summary the session can commit.

Priority order (each step independently skippable via --steps):

  sanity   bench.py default mode (sc16-exact) with --record: the
           headline number vs the committed best.
  gate     accuracy gate (EVM vs golden through compare_app) -- quick,
           proves the full pipeline is numerically sound on-chip.
  ab16     tools/ab_sharded.py 16-antenna whole-vs-split (sc16, 1x1):
           decides whether bench --mesh should default to the whole
           entry (flip only on a >2% interleaved win; docs/PERF.md
           negative: cross-process comparisons lie on the tunnel).
  ab64     same at 64 antennas.
  latency  tools/latency_probe.py --record LATENCY.json (ts=1 ratchet,
           incl. the antenna-sharded streaming bodies).
  soak     120 s sustained-overrun soak at the full reference geometry
           (the committed SOAK_r*.json shape).
  waterfall  full-geometry SNR sweep, fused kernel vs golden (the
           committed WATERFALL.json artifact).
  cache    persistent-compile-cache cold vs warm start (two fresh
           subprocesses sharing a throwaway cache dir) -- the number
           behind the --compile-cache claim in docs/PORTING.md.
  modes    re-run every OTHER BENCH_MODES.json mode with --record
           (ratchet refresh; slowest step, so it runs last).

NOT automated here: the /verify drive (interactive skill) -- run it
alongside this script.

Usage:  python tools/chip_checklist.py [--steps sanity,gate,...]
                                       [--out CHECKLIST_result.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))  # for gate

MODES_FILE = os.path.join(REPO, "BENCH_MODES.json")

_CACHE_SNIPPET = r"""
import sys, time
from ofdm_ls_mrc_tpu.utils import compile_cache
compile_cache.enable(sys.argv[1])
import numpy as np
from ofdm_ls_mrc_tpu import FrameConfig
from ofdm_ls_mrc_tpu.models import UplinkReceiver
cfg = FrameConfig(num_antennas=16, fft_size=1024, cyclic_prefix=0,
                  frame_len=101)
rng = np.random.default_rng(0)
pilot = np.exp(2j * np.pi * rng.random(cfg.num_subcarriers)
               ).astype(np.complex64)
fr = (rng.standard_normal((cfg.frame_len, cfg.num_antennas, cfg.fft_size))
      + 1j * rng.standard_normal((cfg.frame_len, cfg.num_antennas,
                                  cfg.fft_size))).astype(np.complex64) * 0.1
rx = UplinkReceiver(cfg, pilot)
t0 = time.perf_counter()
rx.demod_frame(fr).to_numpy()
print("WARMUP_S", time.perf_counter() - t0)
"""


def _run(cmd, timeout=3600):
    t0 = time.perf_counter()
    r = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                       timeout=timeout)
    dt = time.perf_counter() - t0
    sys.stderr.write(r.stderr)
    return r, dt


def _last_json(stdout: str):
    for ln in reversed(stdout.splitlines()):
        if ln.startswith("{"):
            return json.loads(ln)
    raise RuntimeError(f"no JSON line in output:\n{stdout[-2000:]}")


def _book():
    if os.path.exists(MODES_FILE):
        with open(MODES_FILE) as fh:
            return json.load(fh)
    return {}


def step_sanity(out):
    prev = _book().get("sc16-exact", {}).get("best", 0.0)
    r, dt = _run([sys.executable, "bench.py", "--record", MODES_FILE])
    rec = _last_json(r.stdout)
    out["sanity"] = {"value": rec["value"], "prev_best": prev,
                     "ratio_vs_best": round(rec["value"] / prev, 3)
                     if prev else None, "seconds": round(dt, 1)}
    print(f"[checklist] sanity: {rec['value']/1e9:.2f} Gs/s "
          f"(best {prev/1e9:.2f}, ratio "
          f"{out['sanity']['ratio_vs_best']})")
    return 0 if not prev or rec["value"] >= 0.8 * prev else 1


def step_gate(out):
    r, dt = _run([sys.executable, os.path.join("tools", "gate.py"),
                  "--skip-perf"])
    print(r.stdout, end="")
    out["gate_accuracy"] = {"rc": r.returncode, "seconds": round(dt, 1)}
    return r.returncode


def _step_ab(out, antennas):
    key = f"ab{antennas}"
    r, dt = _run([sys.executable, os.path.join("tools", "ab_sharded.py"),
                  "--mesh", "1x1", "--input", "sc16",
                  "--antennas", str(antennas)])
    if r.returncode != 0:
        out[key] = {"rc": r.returncode, "stderr": r.stderr[-500:]}
        return 1
    rec = _last_json(r.stdout)
    rec["seconds"] = round(dt, 1)
    out[key] = rec
    ratio = rec["whole_vs_split"]
    verdict = ("FLIP --sharded-entry default to whole" if ratio > 1.02
               else "keep split" if ratio >= 0.98
               else "split clearly better")
    print(f"[checklist] {key}: whole/split = {ratio} -> {verdict}")
    return 0


def step_latency(out):
    r, dt = _run([sys.executable, os.path.join("tools", "latency_probe.py"),
                  "--bodies", "fused,composed,fused-sharded,fast-sharded",
                  "--record", os.path.join(REPO, "LATENCY.json")])
    print(r.stdout, end="")
    out["latency"] = {"rc": r.returncode, "seconds": round(dt, 1)}
    return r.returncode


def step_soak(out):
    """120 s sustained-overrun soak at the full reference geometry (the
    committed SOAK_r*.json shape): sc16-native TPU consumer vs a 4 Msps
    paced producer cycling 8 distinct frames, per-frame provenance EVM."""
    r, dt = _run([sys.executable, os.path.join("tools", "soak.py"),
                  "--seconds", "120", "--antennas", "16",
                  "--fft-size", "1024", "--cp-size", "72",
                  "--frame-len", "101", "--ring-dtype", "sc16",
                  "--sc16-native", "--rate", "4e6", "--num-frames", "8",
                  "--timeout", "600"], timeout=2400)
    sys.stdout.write(r.stdout[-500:])
    try:
        rec = _last_json(r.stdout)
    except Exception:
        out["soak"] = {"rc": r.returncode, "stderr": r.stderr[-500:]}
        return 1
    rec["seconds_wall"] = round(dt, 1)
    out["soak"] = rec
    evm_max = (rec.get("evm_clean_db") or {}).get("max")
    print(f"[checklist] soak: {rec['clean_frames']} clean / "
          f"{rec['dirty_frames']} dirty, EVM max "
          f"{'n/a' if evm_max is None else f'{evm_max:.1f} dB'} -> "
          f"{'PASS' if rec['pass'] else 'FAIL'}")
    return 0 if rec["pass"] else 1


def step_waterfall(out):
    """Full-geometry SNR sweep with the fused kernel on the chip (the
    committed WATERFALL.json artifact)."""
    r, dt = _run([sys.executable, os.path.join("tools", "waterfall.py"),
                  "--snrs=-10,-5,0,5,10,15,20", "--seeds", "3",
                  "--pipelines", "golden,fused",
                  "--out", os.path.join(REPO, "WATERFALL.json")],
                 timeout=2400)
    if r.returncode != 0:
        out["waterfall"] = {"rc": r.returncode, "stderr": r.stderr[-500:]}
        return 1
    rec = _last_json(r.stdout)
    rec["seconds"] = round(dt, 1)
    out["waterfall"] = rec
    print(f"[checklist] waterfall: {rec['points']} points, pipelines agree "
          f"to {rec['pipelines_agree_db']} dB")
    return 0 if rec["pipelines_agree_db"] < 0.5 else 1


def step_cache(out):
    with tempfile.TemporaryDirectory() as td:
        times = []
        for leg in ("cold", "warm"):
            r, dt = _run([sys.executable, "-c", _CACHE_SNIPPET, td],
                         timeout=1800)
            if r.returncode != 0:
                out["cache"] = {"rc": r.returncode,
                                "stderr": r.stderr[-500:]}
                return 1
            warm = [ln for ln in r.stdout.splitlines()
                    if ln.startswith("WARMUP_S")]
            times.append(float(warm[0].split()[1]))
            print(f"[checklist] cache {leg}: first demod "
                  f"{times[-1]:.1f}s (process {dt:.1f}s)")
        out["cache"] = {"cold_s": round(times[0], 1),
                        "warm_s": round(times[1], 1),
                        "speedup": round(times[0] / max(times[1], 1e-9), 1)}
        if times[1] >= times[0]:
            # On the axon tunnel both legs are dominated by the REMOTE
            # compile server's cache/congestion state, which a local
            # persistent-cache hit cannot hide (docs/PERF.md r4
            # compile-cache investigation) -- record the confound rather
            # than reporting a meaningless "slowdown".
            out["cache"]["note"] = ("warm >= cold: remote-compile-server "
                                    "state dominated this measurement; "
                                    "see docs/PERF.md")
    return 0


def step_modes(out):
    from gate import _mode_cli  # tools/gate.py, same directory
    book = _book()
    res = {}
    rc = 0
    for mode, entry in sorted(book.items()):
        if mode == "sc16-exact":        # already refreshed by step_sanity
            continue
        r, dt = _run([sys.executable, "bench.py", "--record", MODES_FILE]
                     + _mode_cli(entry["config"]))
        if r.returncode != 0:
            res[mode] = {"rc": r.returncode, "stderr": r.stderr[-300:]}
            rc = 1
            continue
        rec = _last_json(r.stdout)
        prev = entry["best"]
        res[mode] = {"value": rec["value"], "prev_best": prev,
                     "ratio_vs_best": round(rec["value"] / prev, 3),
                     "seconds": round(dt, 1)}
        flag = ("IMPROVED" if rec["value"] > prev
                else "ok" if rec["value"] >= 0.8 * prev else "REGRESSED")
        if flag == "REGRESSED":
            rc = 1
        print(f"[checklist] mode {mode}: {rec['value']/1e9:.2f} Gs/s vs "
              f"best {prev/1e9:.2f} [{flag}]")
    out["modes"] = res
    return rc


STEPS = [("sanity", step_sanity), ("gate", step_gate),
         ("ab16", lambda o: _step_ab(o, 16)),
         ("ab64", lambda o: _step_ab(o, 64)),
         ("latency", step_latency), ("soak", step_soak),
         ("waterfall", step_waterfall), ("cache", step_cache),
         ("modes", step_modes)]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", default=",".join(n for n, _ in STEPS),
                    help="comma list, priority order preserved")
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "CHECKLIST_result.json"))
    args = ap.parse_args()
    want = [s.strip() for s in args.steps.split(",") if s.strip()]
    unknown = set(want) - {n for n, _ in STEPS}
    if unknown:
        raise SystemExit(f"unknown steps: {sorted(unknown)}")

    from bench import wait_for_device
    if not wait_for_device():
        raise SystemExit("checklist: TPU never became available")

    print("[checklist] REMINDER: run the /verify drive alongside this "
          "script (interactive skill, not automated here)")
    out, rc = {}, 0
    for name, fn in STEPS:
        if name not in want:
            continue
        print(f"[checklist] == {name} ==", flush=True)
        try:
            step_rc = fn(out)
        except Exception as e:        # keep going: chip time is precious
            print(f"[checklist] {name} CRASHED: {e}", file=sys.stderr)
            out[name] = {"error": str(e)}
            step_rc = 1
        rc |= step_rc
        with open(args.out, "w") as fh:   # partial results survive a wedge
            json.dump(out, fh, indent=1, sort_keys=True)
            fh.write("\n")
    print(f"[checklist] {'ALL OK' if rc == 0 else 'SOME STEPS FAILED'} "
          f"-> {args.out}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
