"""SNR waterfall tool (tools/waterfall.py): sweep sanity + theory consistency.

The reference has no theory cross-check at all (verification is golden-file
diffing, SURVEY.md section 4); the waterfall contract is the quantitative
replacement: every pipeline demodulates identically at every operating
point, SER falls monotonically with SNR, and measured SER stays within a
small factor of the closed-form AWGN SER evaluated at the measured
per-(realization, bin) post-MRC EVM.
"""

import json
import math
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from waterfall import main, run_sweep, ser_awgn  # noqa: E402


class TestSerAwgn:
    def test_qpsk_closed_form_hand_values(self):
        # Es/N0 = 10 dB: Q(sqrt(10)) = 7.827e-4, Ps = 2Q - Q^2 = 1.565e-3.
        q = 0.5 * math.erfc(math.sqrt(10.0 / 2.0))
        got = float(ser_awgn(np.array([10.0]), "qpsk")[0])
        assert got == pytest.approx(2 * q - q * q, rel=1e-12)
        assert got == pytest.approx(1.565e-3, rel=1e-3)

    def test_16qam_hand_value(self):
        # 16-QAM at Es/N0 = 15 dB: Pr = 0.75*erfc(sqrt(3*31.62/30)),
        # Ps = 1-(1-Pr)^2 ~ 1.09e-2.
        rho = 10 ** 1.5
        pr = 0.75 * math.erfc(math.sqrt(3 * rho / 30.0))
        got = float(ser_awgn(np.array([rho]), "16qam")[0])
        assert got == pytest.approx(1 - (1 - pr) ** 2, rel=1e-12)

    def test_monotone_in_snr(self):
        for scheme in ("qpsk", "16qam", "64qam"):
            s = ser_awgn(10 ** (np.linspace(-1, 2.5, 20)), scheme)
            assert np.all(np.diff(s) < 0)


class TestWaterfallSweep:
    @pytest.fixture(scope="class")
    def sweep(self):
        return run_sweep(antennas=8, fft=128, symbols=33, cp=16,
                         scheme="qpsk", snrs=[-5.0, 0.0, 5.0, 20.0],
                         seeds=2, pipelines=["golden", "composed"],
                         num_taps=4)

    def test_pipelines_agree(self, sweep):
        assert sweep["pipelines_agree_db"] < 0.1
        for row in sweep["rows"]:
            assert row["ser_golden"] == pytest.approx(
                row["ser_composed"], abs=1.0 / row["n_syms"])

    def test_ser_monotone_and_floors_at_zero(self, sweep):
        sers = [row["ser_golden"] for row in sweep["rows"]]
        assert all(a >= b for a, b in zip(sers, sers[1:]))
        # 8-antenna MRC at +20 dB: ~29 dB post-combining -> error-free.
        assert sers[-1] == 0.0

    def test_evm_tracks_snr_with_array_gain(self, sweep):
        # Post-MRC EVM improves ~dB-for-dB with SNR and shows array gain:
        # at snr=5, 8 antennas put the operating point well past 5+6 dB.
        rows = {row["snr_db"]: row for row in sweep["rows"]}
        assert rows[5.0]["evm_db_golden"] < -8.5
        assert rows[5.0]["evm_db_golden"] < rows[0.0]["evm_db_golden"]

    def test_matched_theory_consistency(self, sweep):
        """Measured SER stays within a small factor of the AWGN SER at the
        measured operating point, wherever both are statistically
        meaningful.  (Low-SNR points sit somewhat ABOVE matched theory:
        the LS estimate error is one fixed multiplicative perturbation per
        (realization, bin), not fresh Gaussian noise per symbol.)"""
        for row in sweep["rows"]:
            ser, th = row["ser_golden"], row["ser_theory_golden"]
            if ser * row["n_syms"] < 10 or ser > 0.6:
                continue  # too few errors / saturated
            assert 0.25 * th <= ser <= 4.0 * th, row


class TestWaterfallCli:
    def test_main_writes_artifact(self, tmp_path):
        out = tmp_path / "wf.json"
        rc = main(["--antennas", "4", "--fft", "64", "--symbols", "9",
                   "--cp", "8", "--num-taps", "2", "--snrs", "10,20",
                   "--seeds", "1", "--pipelines", "golden",
                   "--out", str(out)])
        assert rc == 0
        doc = json.loads(out.read_text())
        assert doc["metric"] == "snr_waterfall"
        assert len(doc["rows"]) == 2
        assert {"snr_db", "n_syms", "evm_db_golden", "ser_golden",
                "ser_theory_golden"} <= set(doc["rows"][0])
