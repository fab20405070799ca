#!/usr/bin/env bash
# Reproduce the headline results end to end.
#
#   bash tools/repro.sh            # on a TPU host (bench hits the chip)
#
# Individual pieces:
#   python bench.py                          one JSON line: samples/s/chip
#                                            (sc16-native default mode)
#   python tools/ring_bench.py --batch       shm ingest throughput
#   python -m pytest tests/ -q               220+ tests (forced-CPU 8-dev mesh)
#   docs/PERF.md                             methodology + measured numbers
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== native build =="
make -s -C native

echo "== test suite (virtual 8-device CPU mesh) =="
python -m pytest tests/ -q

echo "== multichip dry run (8 virtual CPU devices) =="
XLA_FLAGS="--xla_force_host_platform_device_count=8" python - <<'EOF'
import jax
jax.config.update("jax_platforms", "cpu")
import __graft_entry__ as g
fn, args = g.entry()
jax.jit(fn)(*args)
g.dryrun_multichip(len(jax.devices()))
print("entry + dryrun OK")
EOF

echo "== antenna-scaling harness (virtual 8-device CPU mesh) =="
python tools/scaling_bench.py --virtual 8 --reps 2 --r-hi 7 --batch 1 \
    --out SCALING_repro.json

echo "== SNR waterfall (theory cross-check, small sweep) =="
python tools/waterfall.py --platform cpu --antennas 8 --fft 128 \
    --symbols 33 --cp 16 --num-taps 4 --snrs=0,10,20 --seeds 2 \
    --pipelines golden,fast --out /tmp/WATERFALL_repro.json \
    --fail-above-db 0.5

echo "== ring ingest benchmark =="
python tools/ring_bench.py --batch --symbols 10100
python tools/ring_bench.py --batch --symbols 10100 --dtype sc16
python tools/ring_bench.py --batch --symbols 10100 --dtype sc16 --batch-write
python tools/ring_bench.py --decompose   # write-leg/read-leg split (PERF.md)

echo "== TPU headline benchmark =="
python bench.py

echo "== sharded-path benchmark (hardware 1x1 mesh) =="
python bench.py --mesh 1x1

echo "== regression gates (EVM vs golden + samples/s floor) =="
python tools/gate.py

# After a chip outage, run the full hardware checklist in priority order
# (headline sanity, accuracy gate, sharded A/B, latency + mode ratchets,
# compile-cache timing) with one command:
#   python tools/chip_checklist.py
# Full per-mode ratchet (one bench per BENCH_MODES.json entry, ~25 min):
#   python tools/gate.py --skip-accuracy --skip-perf --modes
# Refresh the mode records after a perf improvement with:
#   python bench.py [mode flags] --record BENCH_MODES.json
# Per-symbol (ts=1) latency record (and its ratcheting gate):
#   python tools/latency_probe.py --record LATENCY.json
#   python tools/gate.py --skip-accuracy --skip-perf --latency
# Sharded-entry A/B (split vs whole, shared-compile interleaved):
#   python tools/ab_sharded.py --mesh 1x1
# Sustained-pressure soak (three processes, per-frame EVM verdict; on the
# TPU host run minutes long at the reference geometry -- the committed
# SOAK_r4.json is such a run):
#   python tools/soak.py --seconds 120 --antennas 16 --fft-size 1024 \
#       --frame-len 101 --ring-dtype sc16 --sc16-native --rate 4e6
# Full-geometry SNR waterfall with the fused kernel on the chip (the
# committed WATERFALL*.json artifacts):
#   python tools/waterfall.py --pipelines golden,fused [--scheme 16qam]
