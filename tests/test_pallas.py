"""Fused Pallas FFT+MRC kernel vs golden (interpret mode on CPU)."""

import numpy as np
import pytest

from ofdm_ls_mrc_tpu.golden import dsp
from ofdm_ls_mrc_tpu.ops import fft as fft_ops
from ofdm_ls_mrc_tpu.ops import ls as ls_ops
from ofdm_ls_mrc_tpu.ops import mrc as mrc_ops
from ofdm_ls_mrc_tpu.ops.cplx import CArray
from ofdm_ls_mrc_tpu.ops.pallas_mrc import _perm_tables, fused_demod


def crandn(rng, shape):
    return (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
            ).astype(np.complex64)


@pytest.mark.parametrize("a,f,s", [(4, 64, 6), (8, 256, 10), (2, 1024, 9)])
def test_fused_matches_golden(rng, a, f, s):
    pilot_td = crandn(rng, (a, f))
    data_td = crandn(rng, (s, a, f))
    px = np.exp(2j * np.pi * rng.random(f - 1)).astype(np.complex64)

    x_full = ls_ops.pad_pilot(px)
    fft = fft_ops.get_fft("four_step")
    hconj, hsqrd = ls_ops.estimate_channel_full(fft(CArray.from_numpy(pilot_td)), x_full)
    eq = fused_demod(CArray.from_numpy(data_td), hconj, hsqrd, interpret=True)
    got = mrc_ops.finalize(eq).to_numpy()

    want_h, want_hs = dsp.estimate_channel(pilot_td, px)
    want = np.stack([dsp.demod_symbol(data_td[i], want_h, want_hs)
                     for i in range(s)])
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_fused_matches_xla_path(rng):
    a, f, s = 4, 128, 12
    data_td = crandn(rng, (s, a, f))
    px = np.exp(2j * np.pi * rng.random(f - 1)).astype(np.complex64)
    pilot_td = crandn(rng, (a, f))
    x_full = ls_ops.pad_pilot(px)
    fft = fft_ops.get_fft("four_step")
    hconj, hsqrd = ls_ops.estimate_channel_full(fft(CArray.from_numpy(pilot_td)), x_full)
    xla = mrc_ops.mrc_combine(fft(CArray.from_numpy(data_td)), hconj, hsqrd)
    fused = fused_demod(CArray.from_numpy(data_td), hconj, hsqrd, interpret=True)
    np.testing.assert_allclose(fused.to_numpy()[:, 1:], xla.to_numpy()[:, 1:],
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("a", [3, 5, 6, 7])
def test_non_divisible_antenna_counts(rng, a):
    """No antenna may be dropped from the chunk loop (regression: a % ac != 0
    silently truncated the MRC sum)."""
    f, s = 64, 4
    pilot_td = crandn(rng, (a, f))
    data_td = crandn(rng, (s, a, f))
    px = np.exp(2j * np.pi * rng.random(f - 1)).astype(np.complex64)
    x_full = ls_ops.pad_pilot(px)
    fft = fft_ops.get_fft("four_step")
    hconj, hsqrd = ls_ops.estimate_channel_full(fft(CArray.from_numpy(pilot_td)), x_full)
    eq = fused_demod(CArray.from_numpy(data_td), hconj, hsqrd, interpret=True)
    got = mrc_ops.finalize(eq).to_numpy()
    want_h, want_hs = dsp.estimate_channel(pilot_td, px)
    want = np.stack([dsp.demod_symbol(data_td[i], want_h, want_hs)
                     for i in range(s)])
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_perm_tables_roundtrip():
    for f in (64, 256, 1024):
        perm, inv = _perm_tables(f)
        np.testing.assert_array_equal(perm[inv], np.arange(f))
        np.testing.assert_array_equal(inv[perm], np.arange(f))


def test_symbol_padding(rng):
    """Non-tile-multiple symbol counts are zero-padded then sliced back."""
    a, f, s = 2, 64, 5  # s=5 < tile of 8
    data_td = crandn(rng, (s, a, f))
    px = np.exp(2j * np.pi * rng.random(f - 1)).astype(np.complex64)
    pilot_td = crandn(rng, (a, f))
    x_full = ls_ops.pad_pilot(px)
    fft = fft_ops.get_fft("four_step")
    hconj, hsqrd = ls_ops.estimate_channel_full(fft(CArray.from_numpy(pilot_td)), x_full)
    out = fused_demod(CArray.from_numpy(data_td), hconj, hsqrd, interpret=True)
    assert out.shape == (s, f)


def test_choose_tiles_vmem_bounds():
    """Tile selection must respect both the ts*ac*f product cap and the
    ts <= 2*ac guard: _choose_tiles(1, 1024) = (8, 1) would OOM the 16 MB
    scoped VMEM on hardware under Mosaic's HIGHEST dot (ADVICE r1)."""
    from ofdm_ls_mrc_tpu.ops.pallas_mrc import _choose_tiles

    for a in (1, 2, 3, 4, 5, 8, 16, 64):
        for f in (64, 256, 1024, 4096):
            ts, ac = _choose_tiles(a, f)
            assert a % ac == 0
            assert ts * ac * f <= 8 * 1024 or ts == 1
            assert ts <= 2 * ac or ts == 1
    assert _choose_tiles(1, 1024) == (2, 1)
    assert _choose_tiles(16, 1024) == (2, 4)
