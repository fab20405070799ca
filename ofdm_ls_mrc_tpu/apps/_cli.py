"""Shared CLI helpers for the SDR-facing apps.

Mirrors the reference's boost::program_options channel handling: a channel
list ("0", "1", "0,1", ... -- rx_and_corr.cpp:113-114) plus hardware
parameters applied and logged PER CHANNEL in a loop
(rx_and_corr.cpp:157-198; tx_same_seq_no_udp.cpp:169-192).  Here the
parameters also accept per-channel comma lists (e.g. --freq 2.4e9,2.41e9);
a scalar broadcasts to every channel like the reference's single value.
"""

from __future__ import annotations

from typing import List, Optional, Sequence


def parse_channels(spec: Optional[str], n_rows: int) -> List[int]:
    """Channel list -> capture-row indices; None/'' = all rows."""
    if spec in (None, "", "all"):
        return list(range(n_rows))
    try:
        ch = [int(c) for c in str(spec).split(",")]
    except ValueError:
        raise SystemExit(f"--channels {spec!r}: expected e.g. '0', '0,1'")
    for c in ch:
        if not 0 <= c < n_rows:
            raise SystemExit(f"--channels: channel {c} out of range "
                             f"(capture has {n_rows} rows)")
    if len(set(ch)) != len(ch):
        raise SystemExit(f"--channels {spec!r}: duplicate channel")
    return ch


def per_channel(val, n: int, name: str) -> List[float]:
    """Scalar or comma list -> one value per channel."""
    parts = [float(v) for v in str(val).split(",")]
    if len(parts) == 1:
        parts = parts * n
    if len(parts) != n:
        raise SystemExit(f"{name}: {len(parts)} values for {n} channel(s)")
    return parts


def log_channel_config(side: str, channels: Sequence[int], rates, freqs,
                       gains, bws, ant: Optional[str] = None) -> None:
    """Per-channel config report in the reference's console style
    (rx_and_corr.cpp:188-198)."""
    for i, ch in enumerate(channels):
        line = (f"{side} ch {ch}: rate={rates[i]/1e6:.3f} Msps "
                f"freq={freqs[i]/1e6:.3f} MHz gain={gains[i]:.1f} dB")
        if bws[i]:
            line += f" bw={bws[i]/1e6:.3f} MHz"
        if ant:
            line += f" ant={ant}"
        print(line)
