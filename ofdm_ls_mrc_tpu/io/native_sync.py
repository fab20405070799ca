"""ctypes bindings to the native PN correlator (native/pn_sync).

The reference's RX hot loop -- the O(N*P) sliding PN correlation
(rx_and_corr.cpp:332-360) -- runs in C++ on the host.  This binding exposes
the framework's native kernel with the same first-hit/argmax semantics as
the NumPy forms in sim/pn, which remain the oracle and the fallback when
the toolchain is absent.  sim/pn routes through here automatically when the
library is available.
"""

from __future__ import annotations

import ctypes
import threading
from typing import Optional, Tuple

import numpy as np

from ._native import load_native

_lib: Optional[ctypes.CDLL] = None
_lock = threading.Lock()
_unavailable = False

_F32P = ctypes.POINTER(ctypes.c_float)


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _unavailable
    if _unavailable:
        return None
    with _lock:
        if _lib is not None:
            return _lib
        lib = load_native("libpn_sync.so", "pn_sync/pn_sync.cpp",
                          optional=True)
        if lib is None:
            _unavailable = True
            return None
        for name in ("pn_corr_first", "pn_corr_peak", "pn_corr_mags"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_long
        lib.pn_corr_first.argtypes = [_F32P, ctypes.c_long, _F32P,
                                      ctypes.c_long, ctypes.c_float, _F32P]
        lib.pn_corr_peak.argtypes = [_F32P, ctypes.c_long, _F32P,
                                     ctypes.c_long, _F32P]
        lib.pn_corr_mags.argtypes = [_F32P, ctypes.c_long, _F32P,
                                     ctypes.c_long, _F32P]
        _lib = lib
        return lib


def available() -> bool:
    return _load() is not None


def _prep(buf: np.ndarray, pn: np.ndarray):
    b = np.ascontiguousarray(buf, dtype=np.complex64)
    p = np.ascontiguousarray(pn, dtype=np.complex64)
    return b, p


def corr_first(buf: np.ndarray, pn: np.ndarray,
               thres: float) -> Optional[Tuple[int, float]]:
    """Native first-above-threshold scan; None when the library is absent."""
    lib = _load()
    if lib is None:
        return None
    b, p = _prep(buf, pn)
    peak = ctypes.c_float(0.0)
    idx = lib.pn_corr_first(b.ctypes.data_as(_F32P), b.size,
                            p.ctypes.data_as(_F32P), p.size,
                            ctypes.c_float(thres), ctypes.byref(peak))
    return int(idx), float(peak.value)


def corr_peak(buf: np.ndarray, pn: np.ndarray) -> Optional[Tuple[int, float]]:
    """Native argmax scan; None when the library is absent."""
    lib = _load()
    if lib is None:
        return None
    b, p = _prep(buf, pn)
    peak = ctypes.c_float(0.0)
    idx = lib.pn_corr_peak(b.ctypes.data_as(_F32P), b.size,
                           p.ctypes.data_as(_F32P), p.size,
                           ctypes.byref(peak))
    return int(idx), float(peak.value)


def corr_mags(buf: np.ndarray, pn: np.ndarray) -> Optional[np.ndarray]:
    """Full normalized magnitude profile; None when the library is absent."""
    lib = _load()
    if lib is None:
        return None
    b, p = _prep(buf, pn)
    n = b.size - p.size + 1
    if n <= 0:
        return np.zeros(0, np.float32)
    out = np.empty(n, dtype=np.float32)
    lib.pn_corr_mags(b.ctypes.data_as(_F32P), b.size,
                     p.ctypes.data_as(_F32P), p.size,
                     out.ctypes.data_as(_F32P))
    return out
