"""Whole-pipeline Pallas kernel (ops/pallas_pipeline) vs golden, interpret mode.

The kernel requires an (8, 128)-split FFT size, i.e. F = 1024; smaller
geometries keep using ops/pallas_mrc or the XLA fast path.
"""

import numpy as np
import pytest

from ofdm_ls_mrc_tpu.golden import dsp
from ofdm_ls_mrc_tpu.ops import fastpath
from ofdm_ls_mrc_tpu.ops.cplx import CArray
from ofdm_ls_mrc_tpu.ops.pallas_pipeline import demod_frame_fused, fused_pipeline


def crandn(rng, shape):
    return (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
            ).astype(np.complex64)


A, F, CP = 4, 1024, 72


def test_matches_golden_frame(rng):
    s = 9
    frame = crandn(rng, (s, A, F + CP))
    pilot = np.exp(2j * np.pi * rng.random(F - 1)).astype(np.complex64)
    x_perm = fastpath.prepare_pilot_fast(pilot, F)
    got = demod_frame_fused(CArray.from_numpy(frame), x_perm, cp=CP,
                            interpret=True).to_numpy()
    want = dsp.demod_frame(frame, pilot, CP)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_matches_fastpath(rng):
    """Same pipeline as fastpath.demod_frame_fast to fp32-split tolerance."""
    s = 17  # non-multiple of the 8-symbol tile: exercises the pad/trim
    frame = crandn(rng, (s, A, F))
    pilot = np.exp(2j * np.pi * rng.random(F - 1)).astype(np.complex64)
    x_perm = fastpath.prepare_pilot_fast(pilot, F)
    cf = CArray.from_numpy(frame)
    got = demod_frame_fused(cf, x_perm, cp=0, interpret=True).to_numpy()
    want = fastpath.demod_frame_fast(cf, x_perm, cp=0).to_numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_structured_reorder_matches_gather(rng):
    """to_reference_order (take+transpose+roll) == the single-take oracle."""
    import jax.numpy as jnp

    from ofdm_ls_mrc_tpu.ops.pallas_pipeline import (
        _kernel_edge_gather,
        to_reference_order,
    )

    eq = CArray.from_numpy(crandn(rng, (5, F)))
    idx = jnp.asarray(_kernel_edge_gather(F))
    want = np.asarray(eq.re[:, idx]) + 1j * np.asarray(eq.im[:, idx])
    got = to_reference_order(eq, F).to_numpy()
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("a,s,cp", [(1, 2, 0), (1, 9, 72), (3, 2, 16)])
def test_edge_geometries(rng, a, s, cp):
    """Single antenna, minimal frames, zero CP -- the degenerate corners."""
    frame = crandn(rng, (s, a, F + cp))
    pilot = np.exp(2j * np.pi * rng.random(F - 1)).astype(np.complex64)
    x_perm = fastpath.prepare_pilot_fast(pilot, F)
    got = demod_frame_fused(CArray.from_numpy(frame), x_perm, cp=cp,
                            interpret=True).to_numpy()
    want = dsp.demod_frame(frame, pilot, cp)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


@pytest.mark.parametrize("f", [256, 512, 2048])
def test_other_fft_sizes(rng, f):
    """Generalized radix-2 stage-1 covers any (2^k, 128) split."""
    frame = crandn(rng, (6, 2, f + 32))
    pilot = np.exp(2j * np.pi * rng.random(f - 1)).astype(np.complex64)
    x_perm = fastpath.prepare_pilot_fast(pilot, f)
    got = demod_frame_fused(CArray.from_numpy(frame), x_perm, cp=32,
                            interpret=True).to_numpy()
    want = dsp.demod_frame(frame, pilot, 32)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_speed_mode_close_at_bf16_tolerance(rng):
    """exact=False (hi-only products) lands within plain-bf16 error."""
    frame = crandn(rng, (5, A, F))
    pilot = np.exp(2j * np.pi * rng.random(F - 1)).astype(np.complex64)
    x_perm = fastpath.prepare_pilot_fast(pilot, F)
    cf = CArray.from_numpy(frame)
    want = demod_frame_fused(cf, x_perm, cp=0, interpret=True).to_numpy()
    got = demod_frame_fused(cf, x_perm, cp=0, interpret=True,
                            exact=False).to_numpy()
    scale = np.max(np.abs(want))
    assert np.max(np.abs(got - want)) / scale < 5e-2
    assert np.max(np.abs(got - want)) / scale > 1e-5  # genuinely different path


def test_rejects_unsupported_split(rng):
    y = CArray.from_numpy(crandn(rng, (2, A, 192)))  # splits (16, 12): no 128 lane
    h = np.zeros((A, 192), np.float32)
    with pytest.raises(ValueError, match="128"):
        fused_pipeline(y, h, h, np.ones(192, np.float32), interpret=True)
