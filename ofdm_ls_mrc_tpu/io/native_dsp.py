"""ctypes bindings to the native C++ golden DSP (native/golden_dsp).

The reference's DSP core is native (cpuLS.hpp); this wrapper exposes the
framework's C++ mirror for native-vs-NumPy cross-validation and as a
host-side fallback demodulator when no accelerator is present.
"""

from __future__ import annotations

import ctypes
import threading

import numpy as np

from ._native import load_native

_lib = None
_lock = threading.Lock()

_F32P = ctypes.POINTER(ctypes.c_float)


def _load() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        lib = load_native("libgolden_dsp.so", "golden_dsp/golden_dsp.cpp")
        lib.ofdm_fft.argtypes = [_F32P, ctypes.c_int, ctypes.c_int]
        lib.ofdm_fftshift.argtypes = [_F32P, ctypes.c_int]
        lib.ofdm_ifftshift.argtypes = [_F32P, ctypes.c_int]
        lib.ofdm_estimate.argtypes = [_F32P, _F32P, ctypes.c_int, ctypes.c_int,
                                      _F32P, _F32P]
        lib.ofdm_demod_symbol.argtypes = [_F32P, _F32P, _F32P, ctypes.c_int,
                                          ctypes.c_int, _F32P]
        lib.ofdm_demod_frame.argtypes = [_F32P, _F32P, ctypes.c_int, ctypes.c_int,
                                         ctypes.c_int, ctypes.c_int, _F32P]
        lib.ofdm_demod_frame.restype = ctypes.c_int
        lib.ofdm_modulate.argtypes = [_F32P, ctypes.c_int, ctypes.c_int, _F32P]
        lib.ofdm_modulate.restype = ctypes.c_int
        lib.ofdm_zf_precoder.argtypes = [_F32P, ctypes.c_int, ctypes.c_int,
                                         ctypes.c_int, _F32P]
        lib.ofdm_apply_precoder.argtypes = [_F32P, _F32P, ctypes.c_int,
                                            ctypes.c_int, ctypes.c_int, _F32P]
        _lib = lib
        return lib


def _fp(a: np.ndarray):
    return a.ctypes.data_as(_F32P)


def _c64(a) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.complex64)


def fft(x: np.ndarray, inverse: bool = False) -> np.ndarray:
    """Unnormalized DFT of the last axis (forward==np.fft.fft,
    inverse==np.fft.ifft*N)."""
    lib = _load()
    out = _c64(x).copy()
    n = out.shape[-1]
    flat = out.reshape(-1, n)
    for row in flat:
        lib.ofdm_fft(_fp(row.view(np.float32)), n, 1 if inverse else 0)
    return out


def estimate_channel(pilot_td: np.ndarray, pilot_x: np.ndarray):
    """Native LS estimate: ([A, F], [F-1]) -> (hconj [A, F-1], hsqrd [F-1])."""
    lib = _load()
    p = _c64(pilot_td)
    x = _c64(pilot_x)
    a, f = p.shape
    hconj = np.empty((a, f - 1), np.complex64)
    hsqrd = np.empty(f - 1, np.float32)
    lib.ofdm_estimate(_fp(p.view(np.float32)), _fp(x.view(np.float32)), a, f,
                      _fp(hconj.view(np.float32)), _fp(hsqrd))
    return hconj, hsqrd


def demod_symbol(sym_td: np.ndarray, hconj: np.ndarray, hsqrd: np.ndarray) -> np.ndarray:
    lib = _load()
    s = _c64(sym_td)
    hc = _c64(hconj)
    hs = np.ascontiguousarray(hsqrd, np.float32)
    a, f = s.shape
    out = np.empty(f - 1, np.complex64)
    lib.ofdm_demod_symbol(_fp(s.view(np.float32)), _fp(hc.view(np.float32)),
                          _fp(hs), a, f, _fp(out.view(np.float32)))
    return out


def demod_frame(frame: np.ndarray, pilot_x: np.ndarray, cp: int = 0) -> np.ndarray:
    """Native whole-frame demod: [S, A, F+cp] -> [S-1, F-1]."""
    lib = _load()
    fr = _c64(frame)
    x = _c64(pilot_x)
    s, a, sym = fr.shape
    f = sym - cp
    out = np.empty((s - 1, f - 1), np.complex64)
    if lib.ofdm_demod_frame(_fp(fr.view(np.float32)), _fp(x.view(np.float32)),
                            s, a, f, cp, _fp(out.view(np.float32))) != 0:
        raise ValueError(f"invalid geometry: s={s} a={a} f={f} cp={cp}")
    return out


def modulate_symbol(data: np.ndarray, cp: int = 0) -> np.ndarray:
    """Native modulator: [F-1] -> [F+cp], max-abs normalized."""
    lib = _load()
    d = _c64(data)
    f = d.shape[-1] + 1
    out = np.empty(f + cp, np.complex64)
    if lib.ofdm_modulate(_fp(d.view(np.float32)), f, cp,
                         _fp(out.view(np.float32))) != 0:
        raise ValueError(f"invalid geometry: f={f} cp={cp} (need cp <= f)")
    return out


def zf_precoder(h: np.ndarray) -> np.ndarray:
    """Native per-subcarrier ZF precoder: [S, U, A] -> [S, A, U], h @ w == I."""
    lib = _load()
    hc = _c64(h)
    s, u, a = hc.shape
    out = np.empty((s, a, u), np.complex64)
    lib.ofdm_zf_precoder(_fp(hc.view(np.float32)), s, u, a,
                         _fp(out.view(np.float32)))
    return out


def apply_precoder(w: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Native precoder application: w [S, A, U], x [U, S] -> [A, S]."""
    lib = _load()
    wc = _c64(w)
    xc = _c64(x)
    s, a, u = wc.shape
    out = np.empty((a, s), np.complex64)
    lib.ofdm_apply_precoder(_fp(wc.view(np.float32)), _fp(xc.view(np.float32)),
                            s, u, a, _fp(out.view(np.float32)))
    return out
