"""Native C++ golden DSP vs the NumPy oracle."""

import numpy as np
import pytest

from ofdm_ls_mrc_tpu.golden import dsp
from ofdm_ls_mrc_tpu.io import native_dsp


def crandn(rng, shape):
    return (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
            ).astype(np.complex64)


@pytest.mark.parametrize("n", [64, 256, 1024])
def test_fft_matches_numpy(rng, n):
    x = crandn(rng, (3, n))
    got = native_dsp.fft(x)
    want = np.fft.fft(x, axis=-1)
    np.testing.assert_allclose(got, want, atol=1e-3 * np.max(np.abs(want)))


def test_ifft_unnormalized(rng):
    n = 128
    x = crandn(rng, (n,))
    got = native_dsp.fft(x, inverse=True)
    np.testing.assert_allclose(got, np.fft.ifft(x) * n, atol=1e-3)


def test_estimate_matches_golden(rng):
    a, f = 8, 256
    pilot_td = crandn(rng, (a, f))
    px = np.exp(2j * np.pi * rng.random(f - 1)).astype(np.complex64)
    hc, hs = native_dsp.estimate_channel(pilot_td, px)
    want_hc, want_hs = dsp.estimate_channel(pilot_td, px)
    np.testing.assert_allclose(hc, want_hc, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(hs, want_hs, rtol=2e-4)


def test_demod_frame_matches_golden(rng):
    s, a, f, cp = 7, 4, 128, 16
    frame = crandn(rng, (s, a, f + cp))
    px = np.exp(2j * np.pi * rng.random(f - 1)).astype(np.complex64)
    got = native_dsp.demod_frame(frame, px, cp)
    want = dsp.demod_frame(frame, px, cp)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_modulate_matches_golden(rng):
    f, cp = 128, 16
    data = crandn(rng, (f - 1,))
    got = native_dsp.modulate_symbol(data, cp)
    want = dsp.modulate_symbol(data, cp)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_odd_size_dft_fallback(rng):
    x = crandn(rng, (63,))
    got = native_dsp.fft(x)
    np.testing.assert_allclose(got, np.fft.fft(x), atol=1e-3)


def test_zf_precoder_matches_golden(rng):
    s, u, a = 33, 4, 8
    h = crandn(rng, (s, u, a))
    got = native_dsp.zf_precoder(h)
    want = dsp.zf_precoder(h)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
    # the ZF property itself: H @ W == I per subcarrier
    prod = np.einsum("sua,sav->suv", h, got)
    eye = np.broadcast_to(np.eye(u, dtype=np.complex64), (s, u, u))
    np.testing.assert_allclose(prod, eye, atol=2e-3)


def test_apply_precoder_matches_golden(rng):
    s, u, a = 17, 2, 4
    w = crandn(rng, (s, a, u))
    x = crandn(rng, (u, s))
    got = native_dsp.apply_precoder(w, x)
    np.testing.assert_allclose(got, dsp.apply_precoder(w, x), atol=1e-4)


def test_native_geometry_guards():
    """Bad geometry raises ValueError instead of UB (OOB cyclic-prefix read
    in modulate; wrapped size_t allocation in demod_frame)."""
    import pytest

    from ofdm_ls_mrc_tpu.io import native_dsp
    with pytest.raises(ValueError, match="cp <= f"):
        native_dsp.modulate_symbol(np.zeros(7, np.complex64), cp=16)
    with pytest.raises(ValueError, match="invalid geometry"):
        # f = 1 passes the output allocation but would wrap the native
        # vector sizing without the guard.
        native_dsp.demod_frame(np.zeros((3, 2, 9), np.complex64),
                               np.zeros(7, np.complex64), cp=8)
