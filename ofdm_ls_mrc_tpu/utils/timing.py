"""Phase-timing benchmark harness (reference C14).

Replicates the reference's instrumentation contract: per-symbol wall timers
around read / FFT / channel-estimation / decode / prefix-drop phases
(ShMemSymBuff.hpp:77-83; cpuLS.hpp:273-316; gpuLS.cu:361-401), avg+variance
summarization (findAvgAndVar, ShMemSymBuff.hpp:125-147), the console table
(printTimes, ShMemSymBuff.hpp:149-164, frame-latency line
ShMemSymBuff_cucomplex.hpp:166-172), and the binary 5-word dump
(storeTimes, ShMemSymBuff.hpp:166-189) via golden.io.store_times.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, List, Tuple

import numpy as np

from ..golden.io import store_times as _store_times_file

PHASES = ("read", "fft", "chanest", "decode", "drop")


def find_avg_and_var(times: np.ndarray) -> Tuple[float, float]:
    """Mean and population variance, matching findAvgAndVar
    (ShMemSymBuff.hpp:125-147)."""
    t = np.asarray(times, dtype=np.float64)
    if t.size == 0:
        return 0.0, 0.0
    avg = float(t.mean())
    var = float(((t - avg) ** 2).mean())
    return avg, var


@dataclass
class PhaseTimer:
    """Accumulates per-symbol (or per-frame) phase times.

    The reference indexes timers by symbol slot and accumulates across
    ``numTimes`` outer repetitions (cpuLS.hpp:284 ``fft[it] += ...``);
    this class does the same with ``num_times`` as the divisor at report
    time (printTimes divides by numTimes, ShMemSymBuff.hpp:154-157).
    """

    num_slots: int
    num_times: int = 1
    data: Dict[str, np.ndarray] = field(default_factory=dict)

    def __post_init__(self):
        for p in PHASES:
            self.data[p] = np.zeros(self.num_slots, dtype=np.float64)

    @contextlib.contextmanager
    def phase(self, name: str, slot: int):
        t0 = time.perf_counter()
        yield
        self.data[name][slot] += time.perf_counter() - t0

    def add(self, name: str, slot: int, seconds: float) -> None:
        self.data[name][slot] += seconds

    # -- reporting -----------------------------------------------------------
    def summary(self) -> Dict[str, Tuple[float, float]]:
        """Phase -> (avg, var), scaled by num_times like printTimes.

        'chanest' is slot 0 of decode in the reference (decode[0],
        ShMemSymBuff.hpp:155); here it is its own phase array, and 'decode'
        statistics skip slot 0 to mirror &decode[1] (ShMemSymBuff.hpp:151).
        """
        out = {}
        n = self.num_times
        read = find_avg_and_var(self.data["read"])
        out["read"] = (read[0] / n, read[1] / n)
        out["chanest"] = (float(self.data["chanest"][0]) / n, 0.0)
        dec = find_avg_and_var(self.data["decode"][1:]) if self.num_slots > 1 \
            else find_avg_and_var(self.data["decode"])
        out["decode"] = (dec[0] / n, dec[1] / n)
        fft = find_avg_and_var(self.data["fft"])
        out["fft"] = (fft[0] / n, fft[1] / n)
        drop = find_avg_and_var(self.data["drop"])
        out["drop"] = (drop[0] / n, drop[1] / n)
        return out

    def frame_latency(self) -> float:
        """(FFT + read + decode) * (num_slots - 1), the derived frame-latency
        line of ShMemSymBuff_cucomplex.hpp:170."""
        s = self.summary()
        return (s["fft"][0] + s["read"][0] + s["decode"][0]) * (self.num_slots - 1)

    def print_times(self, include_drop: bool = True) -> str:
        """Console table in the reference's printTimes layout."""
        s = self.summary()
        lines = ["\t \t Avg Time(s) \t Variance (s^2)"]
        lines.append(f"Read: \t \t {s['read'][0]:e} \t {s['read'][1]:e}")
        lines.append(f"ChanEst: \t {s['chanest'][0]:e}")
        lines.append(f"Decode: \t {s['decode'][0]:e} \t {s['decode'][1]:e}")
        lines.append(f"FFT: \t \t {s['fft'][0]:e} \t {s['fft'][1]:e}")
        if include_drop:
            lines.append(f"Drop: \t \t {s['drop'][0]:e} \t {s['drop'][1]:e}")
        lines.append(f"Frame latency: \t {self.frame_latency():e}")
        text = "\n".join(lines)
        print(text)
        return text

    def store_times(self, path: str) -> None:
        """Binary 5-word dump, layout-compatible with time_{cpu,gpu}.dat."""
        s = self.summary()
        _store_times_file(path, s["read"][0], s["chanest"][0], s["decode"][0],
                          s["fft"][0], s["drop"][0])
