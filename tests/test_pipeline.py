"""End-to-end pipeline tests: UplinkReceiver / DownlinkTransmitter vs golden."""

import jax
import numpy as np
import pytest

from ofdm_ls_mrc_tpu import FrameConfig
from ofdm_ls_mrc_tpu.golden import dsp
from ofdm_ls_mrc_tpu.models import DownlinkTransmitter, UplinkReceiver
from ofdm_ls_mrc_tpu.sim import ChannelModel, evm_db, make_tx_frame, random_symbols


def crandn(rng, shape):
    return (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
            ).astype(np.complex64)


@pytest.fixture
def small_cfg():
    return FrameConfig(num_antennas=4, fft_size=64, cyclic_prefix=8, frame_len=9)


class TestUplinkReceiver:
    @pytest.mark.parametrize("fft_impl", ["xla", "matmul", "four_step"])
    def test_matches_golden(self, rng, small_cfg, fft_impl):
        cfg = small_cfg
        pilot = np.exp(2j * np.pi * rng.random(cfg.num_subcarriers)).astype(np.complex64)
        frame = crandn(rng, (cfg.frame_len, cfg.num_antennas, cfg.symbol_len))

        want = dsp.demod_frame(frame, pilot, cfg.cyclic_prefix)
        rx = UplinkReceiver(cfg, pilot, fft_impl=fft_impl, donate=False)
        got = rx.demod_frame(frame).to_numpy()
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)

    def test_split_phase_matches_whole_frame(self, rng, small_cfg):
        cfg = small_cfg
        pilot = np.exp(2j * np.pi * rng.random(cfg.num_subcarriers)).astype(np.complex64)
        frame = crandn(rng, (cfg.frame_len, cfg.num_antennas, cfg.symbol_len))
        rx = UplinkReceiver(cfg, pilot, donate=False)
        whole = rx.demod_frame(frame).to_numpy()
        h = rx.estimate_channel(frame[0])
        split = rx.demod_data(frame[1:], *h).to_numpy()
        np.testing.assert_allclose(whole, split, atol=1e-5)

    def test_loopback_evm_through_channel(self, rng, small_cfg):
        cfg = small_cfg
        data, _ = random_symbols(rng, (cfg.num_data_symbols, cfg.num_subcarriers), "qpsk")
        pilot = np.exp(2j * np.pi * rng.random(cfg.num_subcarriers)).astype(np.complex64)
        tx = make_tx_frame(data, pilot, cfg.cyclic_prefix)
        chan = ChannelModel(cfg.num_antennas, cfg.fft_size, num_taps=4,
                            snr_db=35.0, seed=3)
        rx_frame = chan.apply(tx, cfg.cyclic_prefix)
        rx = UplinkReceiver(cfg, pilot, donate=False)
        out = np.fft.fftshift(rx.demod_frame(rx_frame).to_numpy(), axes=-1)
        assert evm_db(out, data) < -25.0

    def test_demod_capture_matches_per_frame(self, rng, small_cfg):
        cfg = small_cfg
        pilot = np.exp(2j * np.pi * rng.random(cfg.num_subcarriers)).astype(np.complex64)
        cap = crandn(rng, (3, cfg.frame_len, cfg.num_antennas, cfg.symbol_len))
        rx = UplinkReceiver(cfg, pilot)
        got = rx.demod_capture(cap).to_numpy()
        want = np.stack([rx.demod_frame(cap[k]).to_numpy() for k in range(3)])
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_fused_pipeline_matches_fast(self, rng):
        """pipeline='fused' (whole-pipeline Pallas kernel, interpreted on CPU)
        agrees with pipeline='fast' at the reference FFT size."""
        cfg = FrameConfig(num_antennas=2, fft_size=1024, cyclic_prefix=16,
                          frame_len=4)
        pilot = np.exp(2j * np.pi * rng.random(cfg.num_subcarriers)).astype(np.complex64)
        frame = crandn(rng, (cfg.frame_len, cfg.num_antennas, cfg.symbol_len))
        fast = UplinkReceiver(cfg, pilot, fft_impl="four_step",
                              pipeline="fast").demod_frame(frame).to_numpy()
        fused = UplinkReceiver(cfg, pilot, fft_impl="four_step",
                               pipeline="fused").demod_frame(frame).to_numpy()
        np.testing.assert_allclose(fused, fast, rtol=3e-4, atol=3e-4)

    def test_fused_pipeline_falls_back_without_128_split(self, rng, small_cfg):
        pilot = np.exp(2j * np.pi * rng.random(small_cfg.num_subcarriers)
                       ).astype(np.complex64)
        # The downgrade must be LOUD (VERDICT r2 Weak #7): a typo'd FFT size
        # must not silently cost the flagship kernel.
        with pytest.warns(RuntimeWarning, match="falling back"):
            rx = UplinkReceiver(small_cfg, pilot, fft_impl="four_step",
                                pipeline="fused")
        assert rx.pipeline == "fast"  # 64-point FFT has no (8, 128) split
        # On complex-dtype backends (fft_impl='xla') everything routes to the
        # composed ops, self.pipeline says so honestly, and the downgrade is
        # loud (same rule as StreamingDemodulator, streaming.py).
        with pytest.warns(RuntimeWarning, match="complex-dtype"):
            rx2 = UplinkReceiver(small_cfg, pilot, fft_impl="xla",
                                 pipeline="fast")
        assert rx2.pipeline == "composed"
        with pytest.raises(ValueError, match="unknown pipeline"):
            UplinkReceiver(small_cfg, pilot, pipeline="fastt")

    def test_reference_default_geometry(self, rng):
        """16 ant x 1024 FFT x 101 symbols -- the reference's GPU config."""
        cfg = FrameConfig()
        pilot = np.exp(2j * np.pi * rng.random(cfg.num_subcarriers)).astype(np.complex64)
        frame = crandn(rng, (cfg.frame_len, cfg.num_antennas, cfg.symbol_len))
        rx = UplinkReceiver(cfg, pilot, donate=False)
        got = rx.demod_frame(frame).to_numpy()
        assert got.shape == (100, 1023)
        want = dsp.demod_frame(frame, pilot, cfg.cyclic_prefix)
        # Spot-check a slice (full-frame allclose is covered at small size).
        np.testing.assert_allclose(got[::25], want[::25], rtol=3e-3, atol=3e-3)


class TestDownlinkTransmitter:
    def test_zf_then_uplink_channel(self, rng, small_cfg):
        """Precode for a known channel; each user's stream arrives clean."""
        cfg = small_cfg
        s, u, a = cfg.num_subcarriers, cfg.num_users, cfg.num_antennas
        h = crandn(rng, (s, u, a))
        x = crandn(rng, (u, s))
        tx = DownlinkTransmitter(cfg)
        ant = tx.precode(h, x).to_numpy()
        rx = np.einsum("sua,as->us", h, ant)
        np.testing.assert_allclose(rx, x, atol=1e-3)

    def test_modulate_matches_golden(self, rng, small_cfg):
        cfg = small_cfg
        data = crandn(rng, (cfg.num_antennas, cfg.num_subcarriers))
        tx = DownlinkTransmitter(cfg)
        got = tx.modulate(data).to_numpy()
        want = dsp.modulate_symbol(data, cp=cfg.cyclic_prefix)
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_modulate_frame_closes_loop_with_receiver(self, rng, small_cfg):
        cfg = small_cfg
        data, _ = random_symbols(rng, (cfg.num_data_symbols, cfg.num_subcarriers), "qpsk")
        pilot = np.exp(2j * np.pi * rng.random(cfg.num_subcarriers)).astype(np.complex64)
        tx = DownlinkTransmitter(cfg)
        frame_1stream = tx.modulate_frame(data, pilot).to_numpy()      # [S, F+cp]
        chan = ChannelModel(cfg.num_antennas, cfg.fft_size, num_taps=4,
                            snr_db=300.0, seed=4)
        rx_frame = chan.apply(frame_1stream, cfg.cyclic_prefix)
        rx = UplinkReceiver(cfg, pilot, donate=False)
        out = np.fft.fftshift(rx.demod_frame(rx_frame).to_numpy(), axes=-1)
        np.testing.assert_allclose(out, data, atol=1e-2)


def test_summarize_trace_parses_profiler_output(tmp_path, rng):
    """utils.profiling.summarize_trace aggregates per-op durations from a
    jax.profiler capture (works on the CPU backend too)."""
    import jax
    import jax.numpy as jnp
    import pytest

    from ofdm_ls_mrc_tpu.utils import profiling

    f = jax.jit(lambda x: jnp.sum(x * x))
    x = jnp.asarray(rng.standard_normal((256, 256)), jnp.float32)
    try:
        with profiling.trace(str(tmp_path)):
            for _ in range(3):
                out = f(x)
            jax.block_until_ready(out)
    except Exception as e:  # profiler availability varies by backend build
        pytest.skip(f"profiler unavailable: {e}")
    # CPU traces have no TPU track; host-side parse must still work.
    ops = profiling.summarize_trace(str(tmp_path), device_only=False)
    assert ops, "no events parsed"
    total, count = next(iter(ops.values()))
    assert total > 0 and count >= 1


def test_bench_sharded_harness_smoke(rng):
    """bench.bench_sharded runs on a 2-device virtual mesh and returns a
    positive per-frame time; psum_payload_bytes matches the fused-psum
    payload formula (2*S_local + 1) * F * 4."""
    import os
    import sys
    sys.path.insert(0, os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..")))
    from bench import bench_sharded, psum_payload_bytes

    from ofdm_ls_mrc_tpu import FrameConfig

    cfg = FrameConfig(num_antennas=4, fft_size=64, cyclic_prefix=0,
                      frame_len=5)
    assert psum_payload_bytes(cfg, 1) == (2 * 4 + 1) * 64 * 4
    assert psum_payload_bytes(cfg, 2) == (2 * 2 + 1) * 64 * 4
    pilot = np.exp(2j * np.pi * rng.random(cfg.num_subcarriers)
                   ).astype(np.complex64)
    frames = (rng.standard_normal((2, 5, 4, 64))
              + 1j * rng.standard_normal((2, 5, 4, 64))).astype(np.complex64)
    t = bench_sharded(cfg, pilot, frames, reps=1, mesh_shape=(2, 1),
                      pipeline="fast", r_hi=3)
    assert t > 0

    # The fused shard body honors the kernel-precision flag (exact=False is
    # the bf16 speed mode): plumbed bench.py -> ShardedUplinkReceiver.
    cfg_f = FrameConfig(num_antennas=4, fft_size=256, cyclic_prefix=0,
                        frame_len=3)
    pilot_f = np.exp(2j * np.pi * rng.random(cfg_f.num_subcarriers)
                     ).astype(np.complex64)
    frames_f = (rng.standard_normal((1, 3, 4, 256))
                + 1j * rng.standard_normal((1, 3, 4, 256))
                ).astype(np.complex64)
    t_f = bench_sharded(cfg_f, pilot_f, frames_f, reps=1, mesh_shape=(2, 1),
                        pipeline="fused", r_hi=3, exact=False)
    assert t_f > 0

    # Whole-frame kernel-native entry (--sharded-entry whole): frames are
    # placed whole and the pilot row is sliced in-shard.
    t_w = bench_sharded(cfg_f, pilot_f, frames_f, reps=1, mesh_shape=(2, 1),
                        pipeline="fused", r_hi=3, exact=False, entry="whole")
    assert t_w > 0

    # Time-sharded whole entry: bench builds the pilot-per-block layout.
    t_wt = bench_sharded(cfg_f, pilot_f, frames_f, reps=1, mesh_shape=(2, 2),
                         pipeline="fused", r_hi=3, exact=False, entry="whole")
    assert t_wt > 0


def test_wait_for_device_preflight(monkeypatch):
    """bench.wait_for_device: no-op off the axon platform; honors the
    opt-out; retries (bounded) through failing subprocess probes and
    succeeds as soon as one passes -- the guard against a stale chip claim
    hanging PJRT init in-process."""
    import bench

    # Non-axon session: never probes.
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setattr(bench, "_PROBE_CODE", "raise SystemExit(1)")
    assert bench.wait_for_device(attempts=1, probe_timeout=5, sleep_s=0)

    # axon + opt-out: never probes.
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setenv("OFDM_BENCH_NO_WAIT", "1")
    assert bench.wait_for_device(attempts=1, probe_timeout=5, sleep_s=0)
    monkeypatch.delenv("OFDM_BENCH_NO_WAIT")

    # axon env but the caller forced CPU in-process (the repro/dryrun path):
    # never probes -- the suite's conftest really did set jax_platforms=cpu.
    assert bench._configured_platforms() == "cpu"
    assert bench.wait_for_device(attempts=1, probe_timeout=5, sleep_s=0)
    # The remaining branches exercise the probing path: pretend no override.
    monkeypatch.setattr(bench, "_configured_platforms", lambda: None)

    # Failing probes exhaust the bounded budget and report False (the
    # caller proceeds anyway).
    assert not bench.wait_for_device(attempts=2, probe_timeout=5, sleep_s=0)

    # A passing probe returns True.
    monkeypatch.setattr(bench, "_PROBE_CODE", "pass")
    assert bench.wait_for_device(attempts=1, probe_timeout=30, sleep_s=0)

    # OFDM_BENCH_WAIT_S overrides the budget: a 10 s budget at 5 s/attempt
    # means 2 attempts, so a failing probe exhausts quickly even when the
    # caller asked for many attempts.
    monkeypatch.setattr(bench, "_PROBE_CODE", "raise SystemExit(1)")
    monkeypatch.setenv("OFDM_BENCH_WAIT_S", "10")
    import time as _time
    t0 = _time.perf_counter()
    assert not bench.wait_for_device(attempts=1000, probe_timeout=5, sleep_s=0)
    assert _time.perf_counter() - t0 < 60


def test_gate_mode_book_and_cli(tmp_path):
    """gate.py's per-mode ratchet plumbing: the record book round-trips and
    _mode_cli reconstructs the exact bench invocation (VERDICT r2: per-mode
    floors so a regressed sc16/64-ant path can't hide behind the default)."""
    import json
    import os
    import sys
    sys.path.insert(0, os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", "tools")))
    import gate

    entry = {"value": 28.2e9, "best": 28.5e9,
             "config": {"input": "sc16", "pipeline": "fused",
                        "kernel_precision": "exact", "antennas": 16,
                        "fft": 1024, "symbols": 101, "mesh": None}}
    cli = gate._mode_cli(entry["config"])
    # Variant fields absent from pre-r3 records rebuild the bench defaults.
    assert cli == ["--input", "sc16", "--pipeline", "fused",
                   "--kernel-precision", "exact", "--antennas", "16",
                   "--fft", "1024", "--symbols", "101",
                   "--sharded-entry", "split", "--cp-where", "host",
                   "--cp", "72"]
    mesh_cli = gate._mode_cli({**entry["config"], "mesh": "1x1",
                               "sharded_entry": "whole",
                               "fuse_estimate": True,
                               "cp_where": "device"})
    assert "--mesh" in mesh_cli and "1x1" in mesh_cli
    assert mesh_cli[mesh_cli.index("--sharded-entry") + 1] == "whole"
    assert "--fuse-estimate" in mesh_cli
    assert mesh_cli[mesh_cli.index("--cp-where") + 1] == "device"

    book_path = tmp_path / "BENCH_MODES.json"
    book_path.write_text(json.dumps({"sc16-exact": entry}))
    old = gate.MODES_FILE
    try:
        gate.MODES_FILE = str(book_path)
        assert gate.load_mode_book()["sc16-exact"]["best"] == 28.5e9
    finally:
        gate.MODES_FILE = old


def test_gate_latency_ratchet(tmp_path, monkeypatch):
    """gate.py --latency: the ts=1 record book ratchets DOWN -- a
    re-measured us/symbol above best*(1+margin) fails, within passes."""
    import json
    import os
    import subprocess
    import sys
    sys.path.insert(0, os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", "tools")))
    import gate

    key = "fused-16ant-fft1024"
    book = {key: {"body": "fused", "best": 7.0, "value": 7.0, "unit": "us",
                  "config": {"antennas": 16, "fft": 1024, "batch": 256,
                             "r_hi": 101}}}
    lat_path = tmp_path / "LATENCY.json"
    lat_path.write_text(json.dumps(book))

    def fake_run(cmd, **kw):
        # The probe re-records into the tmp file named by --record.
        out = cmd[cmd.index("--record") + 1]
        with open(out, "w") as fh:
            json.dump({key: {"body": "fused", "best": 7.0,
                             "value": fake_run.value,
                             "config": book[key]["config"]}}, fh)
        return subprocess.CompletedProcess(cmd, 0, "", "")

    monkeypatch.setattr(gate, "LATENCY_FILE", str(lat_path))
    monkeypatch.setattr(gate.subprocess, "run", fake_run)
    fake_run.value = 7.5          # within 7.0 * 1.20
    assert gate.gate_latency() == 0
    fake_run.value = 9.1          # above the ceiling
    assert gate.gate_latency() == 1
