"""Continuous PN re-synchronization for streaming RX ingest.

The reference receive loop correlates EVERY receive buffer against the PN
sequence, stitches the frame payload across its double buffer, and hands the
aligned frame to a writer thread (rx_and_corr.cpp:305-405).  Round 1's
rx_app synced once at capture start and assumed perfect periodicity -- one
dropped/inserted sample desynced every later frame.  StreamSynchronizer is
the redesigned engine: a rolling sample-stream state machine that

  * acquires frame sync with a full sliding correlation
    (correlate_frame_start, the reference arithmetic, rx_and_corr.cpp:332-360),
  * while synced, verifies the PN at its expected position within a small
    search window every frame -- absorbing inserted-sample drift in place
    (the window hit moves by +d) -- and
  * falls back to full re-acquisition when the PN vanishes from the window
    (sample drops, gaps, muted stretches), losing at most the damaged frame.

Stitching across receive-buffer boundaries is inherent: pushed buffers
append to a pending tail and frames are cut wherever the payload lands
(the double-buffer stitch of rx_and_corr.cpp:372-393 without the two-buffer
special case).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from .pn import correlate_frame_start, correlate_peak


class StreamSynchronizer:
    """Rolling PN frame synchronizer over a (multi-antenna) sample stream.

    Stream format: each frame is ``[PN][frame_samps payload]`` (the
    reference TX prepends the PN to every send buffer,
    tx_same_seq_no_udp.cpp:255-267, so the preamble recurs).

    Usage:
      sync = StreamSynchronizer(pn, frame_samps, thres=0.1)
      for buf in receive_buffers:          # [A, L] chunks of any length
          for frame in sync.push(buf):     # aligned [A, frame_samps] payloads
              ...

    Correlation runs on channel 0 (the reference scans channels in order and
    stops at the first hit, rx_and_corr.cpp:333-359).

    Counters: ``frames_emitted``, ``resyncs`` (full re-acquisitions after
    losing the PN), ``drift_corrections`` (in-window realignments).
    """

    def __init__(self, pn: np.ndarray, frame_samps: int, thres: float,
                 slack: Optional[int] = None):
        self.pn = np.asarray(pn, dtype=np.complex64)
        if self.pn.size < 2:
            raise ValueError("PN sequence too short")
        self.frame_samps = int(frame_samps)
        self.thres = float(thres)
        # Search slack while synced: inserted-sample drift up to this many
        # samples per frame is absorbed without re-acquisition.
        self.slack = int(slack) if slack is not None else max(8, self.pn.size // 4)
        self.pending: Optional[np.ndarray] = None   # [A, n] unconsumed tail
        self.synced = False
        self.frames_emitted = 0
        self.resyncs = 0
        self.drift_corrections = 0
        self._ever_synced = False

    # -- stream input --------------------------------------------------------
    def push(self, samples: np.ndarray) -> List[np.ndarray]:
        """Append a receive buffer ([A, L] or [L]) and return every aligned
        frame payload ([A, frame_samps]) now extractable."""
        s = np.atleast_2d(np.asarray(samples))
        if self.pending is None:
            self.pending = np.array(s)
        else:
            if s.shape[0] != self.pending.shape[0]:
                raise ValueError(f"channel count changed: {s.shape[0]} != "
                                 f"{self.pending.shape[0]}")
            self.pending = np.concatenate([self.pending, s], axis=1)
        out = []
        while True:
            fr = self._try_extract()
            if fr is None:
                return out
            out.append(fr)

    def flush(self) -> List[np.ndarray]:
        """End-of-stream teardown hook.

        Always returns [] today: push() extracts to exhaustion on every
        call, and an incomplete tail (PN + partial frame) can never become
        a whole aligned frame -- matching the reference, which simply stops
        receiving (rx_and_corr.cpp:408).  Kept as the explicit end-of-stream
        point so callers have one place to drain if partial-frame emission
        is ever added."""
        return []

    # -- state machine -------------------------------------------------------
    def _consume(self, n: int) -> None:
        self.pending = self.pending[:, n:]

    def _try_extract(self) -> Optional[np.ndarray]:
        pn_len = self.pn.size
        need = pn_len + self.frame_samps
        p = self.pending
        if p is None or p.shape[1] < need:
            return None

        if not self.synced:
            start, _peak = correlate_frame_start(p[0], self.pn, self.thres)
            if start < 0:
                # No peak among the complete windows; a PN straddling the
                # buffer end lives in the last pn_len-1 samples -- keep them.
                self._consume(max(p.shape[1] - (pn_len - 1), 0))
                return None
            self._consume(start)
            self.synced = True
            if self._ever_synced:
                self.resyncs += 1
            self._ever_synced = True
            return self._try_extract() if self.pending.shape[1] >= need else None

        # Synced: the PN is expected at offset 0; verify within the slack
        # window (correlate THIS buffer like the reference correlates every
        # recv, rx_and_corr.cpp:332-360).  The STRONGEST in-window lag is
        # used -- first-above-threshold could lock onto a payload sidelobe
        # one lag before the true peak.
        window = min(pn_len + self.slack, p.shape[1])
        d, peak = correlate_peak(p[0, :window], self.pn)
        if peak < self.thres:
            d = -1
        if d < 0:
            # PN gone from where it should be: drop/gap corrupted the frame.
            self.synced = False
            return self._try_extract()
        if d > 0:
            self.drift_corrections += 1
            self._consume(d)
            if self.pending.shape[1] < need:
                return None
        payload = np.array(self.pending[:, pn_len:pn_len + self.frame_samps])
        self._consume(pn_len + self.frame_samps)
        self.frames_emitted += 1
        return payload
