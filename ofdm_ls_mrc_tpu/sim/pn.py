"""PN sequences and frame synchronization.

The reference RX app loads a 255-chip maximal-length sequence and finds the
frame start with a sliding cross-correlation against the raw receive buffer,
declaring sync when ``|corr|/len >= thres`` (rx_and_corr.cpp:227-235,332-360).
Here the sequence can also be generated (the reference ships the .dat file
out-of-repo) and the correlator is expressed as an FFT-free vectorized dot
so it matches the reference arithmetic exactly.
"""

from __future__ import annotations

import os

import numpy as np


def _native():
    """The C++ correlator (native/pn_sync) when built; the NumPy forms below
    are the oracle and fallback.  OFDM_NO_NATIVE_SYNC=1 forces NumPy."""
    if os.environ.get("OFDM_NO_NATIVE_SYNC"):
        return None
    from ..io import native_sync
    return native_sync if native_sync.available() else None


def max_len_sequence(length: int = 255) -> np.ndarray:
    """Generate a maximal-length (m-)sequence mapped to +-1 BPSK chips.

    length must be 2**k - 1.  Uses standard primitive polynomials for the
    common register sizes.
    """
    k = int(np.log2(length + 1))
    if (1 << k) - 1 != length:
        raise ValueError(f"length {length} is not 2**k - 1")
    # Primitive polynomial taps (XOR positions, 1-indexed from MSB register).
    taps_by_k = {3: (3, 2), 4: (4, 3), 5: (5, 3), 6: (6, 5), 7: (7, 6),
                 8: (8, 6, 5, 4), 9: (9, 5), 10: (10, 7)}
    if k not in taps_by_k:
        raise ValueError(
            f"length {length} (register size {k}) has no primitive "
            f"polynomial registered; supported lengths: "
            f"{sorted((1 << j) - 1 for j in taps_by_k)}")
    taps = taps_by_k[k]
    state = [1] * k
    out = np.empty(length, dtype=np.float32)
    for i in range(length):
        out[i] = 1.0 if state[-1] else -1.0
        fb = 0
        for t in taps:
            fb ^= state[t - 1]
        state = [fb] + state[:-1]
    return out.astype(np.complex64)


def correlate_frame_start(buf: np.ndarray, pn: np.ndarray, thres: float):
    """Sliding PN correlation for frame sync (rx_and_corr.cpp:332-360).

    For each offset i the reference computes ``sum_j pn[j]*buf[i+j]`` (note:
    NOT conjugated, matching line 344) and triggers at the first i where
    ``abs(corr)/len(pn) >= thres``.

    Args:
      buf:   [N] complex64 received samples.
      pn:    [P] complex64 PN sequence.
      thres: normalized magnitude threshold.

    Returns:
      (index, peak) -- first offset meeting the threshold and its normalized
      magnitude, or (-1, max_peak) when no offset qualifies.
    """
    buf = np.asarray(buf)
    pn = np.asarray(pn)
    n = buf.size - pn.size + 1
    if n <= 0:
        return -1, 0.0
    nat = _native()
    if nat is not None:
        return nat.corr_first(buf, pn, thres)
    # corr[i] = sum_j pn[j] * buf[i+j]  == correlate(buf, conj(pn)) sans conj.
    corr = np.correlate(buf[: n + pn.size - 1], np.conj(pn), mode="valid")
    # np.correlate conjugates its second arg; feed conj(pn) to undo it.
    mags = np.abs(corr) / pn.size
    hits = np.nonzero(mags >= thres)[0]
    if hits.size == 0:
        return -1, float(mags.max(initial=0.0))
    i = int(hits[0])
    return i, float(mags[i])


def correlate_peak(buf: np.ndarray, pn: np.ndarray):
    """(argmax_offset, mag) of the sliding PN correlation over buf.

    Unlike correlate_frame_start's first-above-threshold scan (the reference
    acquisition semantics), this returns the STRONGEST lag -- the robust
    choice when verifying an expected peak inside a small window, where a
    payload sidelobe could otherwise out-race the true peak
    (StreamSynchronizer's synced-state check).
    """
    buf = np.asarray(buf)
    pn = np.asarray(pn)
    n = buf.size - pn.size + 1
    if n <= 0:
        return -1, 0.0
    nat = _native()
    if nat is not None:
        return nat.corr_peak(buf, pn)
    corr = np.correlate(buf[: n + pn.size - 1], np.conj(pn), mode="valid")
    mags = np.abs(corr) / pn.size
    i = int(np.argmax(mags))
    return i, float(mags[i])


def frame_start_payload(buf1: np.ndarray, buf2: np.ndarray, pn: np.ndarray,
                        thres: float) -> np.ndarray | None:
    """Stitch one frame's payload across a double buffer after PN sync.

    Mirrors rx_and_corr.cpp:372-393: payload = buf1[start+len(pn):] followed
    by buf2[:start] so the stitched length is len(buf1) - len(pn).

    Returns None when no correlation peak is found.
    """
    start, _ = correlate_frame_start(buf1, pn, thres)
    if start < 0:
        return None
    return np.concatenate([buf1[start + pn.size:], buf2[:start]])
