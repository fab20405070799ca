"""State persistence (checkpoint/resume) + compare_app tests."""

import os
import subprocess
import sys

import numpy as np
import pytest

from ofdm_ls_mrc_tpu import FrameConfig
from ofdm_ls_mrc_tpu.io.state import load_estimate, save_estimate
from ofdm_ls_mrc_tpu.models import StreamingDemodulator, UplinkReceiver
from ofdm_ls_mrc_tpu.golden.io import append_output

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def crandn(rng, shape):
    return (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
            ).astype(np.complex64)


CFG = FrameConfig(num_antennas=4, fft_size=64, cyclic_prefix=8, frame_len=6)


def test_estimate_roundtrip_resumes_streaming(rng, tmp_path):
    """Save the estimate from one demodulator; a fresh one resumes with it."""
    pilot = np.exp(2j * np.pi * rng.random(CFG.num_subcarriers)).astype(np.complex64)
    frame = crandn(rng, (CFG.frame_len, CFG.num_antennas, CFG.symbol_len))

    sd1 = StreamingDemodulator(CFG, pilot)
    sd1.push_pilot(frame[0])
    want = sd1.push_symbol(frame[1]).to_numpy()
    path = str(tmp_path / "state.npz")
    save_estimate(path, CFG, sd1._hconj, sd1._hsqrd, frame_index=3)

    sd2 = StreamingDemodulator(CFG, pilot)
    hconj, hsqrd, idx = load_estimate(path, CFG)
    sd2._hconj, sd2._hsqrd = hconj, hsqrd
    assert idx == 3
    got = sd2.push_symbol(frame[1]).to_numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_geometry_mismatch_rejected(rng, tmp_path):
    pilot = np.exp(2j * np.pi * rng.random(CFG.num_subcarriers)).astype(np.complex64)
    sd = StreamingDemodulator(CFG, pilot)
    sd.push_pilot(crandn(rng, (CFG.num_antennas, CFG.symbol_len)))
    path = str(tmp_path / "state.npz")
    save_estimate(path, CFG, sd._hconj, sd._hsqrd)
    other = FrameConfig(num_antennas=8, fft_size=64, cyclic_prefix=8, frame_len=6)
    with pytest.raises(ValueError, match="num_antennas"):
        load_estimate(path, other)


def _run_compare(args):
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "PYTHONPATH": REPO + os.pathsep + os.environ.get("PYTHONPATH", "")}
    return subprocess.run(
        [sys.executable, "-m", "ofdm_ls_mrc_tpu.apps.compare_app"] + args,
        capture_output=True, text=True, timeout=120, env=env, cwd=REPO)


def test_compare_app_pass_and_fail(rng, tmp_path):
    a = crandn(rng, (5, 63))
    pa = str(tmp_path / "a.dat"); pb = str(tmp_path / "b.dat"); pc = str(tmp_path / "c.dat")
    append_output(pa, a, truncate=True)
    append_output(pb, a + 1e-5 * crandn(rng, a.shape), truncate=True)
    append_output(pc, a + 0.5 * crandn(rng, a.shape), truncate=True)

    r = _run_compare([pa, pb, "--subcarriers", "63", "--threshold-db", "-40"])
    assert r.returncode == 0 and "PASS" in r.stdout, r.stdout + r.stderr
    r = _run_compare([pa, pc, "--subcarriers", "63", "--threshold-db", "-40"])
    assert r.returncode == 1 and "FAIL" in r.stderr, r.stdout + r.stderr


def test_compare_app_ser(rng, tmp_path):
    from ofdm_ls_mrc_tpu.sim.channel import random_symbols

    sent, _ = random_symbols(rng, (4, 63), "16qam")
    rx = sent + 0.02 * crandn(rng, sent.shape)   # well inside decision regions
    bad = rx.copy()
    bad[0, 0] = -bad[0, 0]                       # one flipped decision
    pa = str(tmp_path / "sent.dat"); pb = str(tmp_path / "rx.dat")
    pc = str(tmp_path / "bad.dat")
    append_output(pa, sent.astype(np.complex64), truncate=True)
    append_output(pb, rx.astype(np.complex64), truncate=True)
    append_output(pc, bad.astype(np.complex64), truncate=True)

    common = ["--subcarriers", "63", "--threshold-db", "0",
              "--modulation", "16qam", "--ser-threshold", "0"]
    r = _run_compare([pa, pb] + common)
    assert r.returncode == 0 and "SER:     0.000e+00" in r.stdout, \
        r.stdout + r.stderr
    r = _run_compare([pa, pc] + common)
    assert r.returncode == 1 and "1/252" in r.stdout, r.stdout + r.stderr
