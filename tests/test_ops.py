"""JAX op layer (planar complex) vs the golden NumPy oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ofdm_ls_mrc_tpu import ops
from ofdm_ls_mrc_tpu.golden import dsp
from ofdm_ls_mrc_tpu.ops.cplx import CArray


def crandn(rng, shape):
    return (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
            ).astype(np.complex64)


class TestCArray:
    def test_roundtrip(self, rng):
        x = crandn(rng, (3, 5))
        np.testing.assert_array_equal(CArray.from_numpy(x).to_numpy(), x)

    def test_arithmetic_matches_numpy(self, rng):
        a = crandn(rng, (4, 8))
        b = crandn(rng, (4, 8))
        ca, cb = CArray.from_numpy(a), CArray.from_numpy(b)
        np.testing.assert_allclose((ca * cb).to_numpy(), a * b, atol=1e-5)
        np.testing.assert_allclose((ca + cb).to_numpy(), a + b, atol=1e-6)
        np.testing.assert_allclose((ca - cb).to_numpy(), a - b, atol=1e-6)
        np.testing.assert_allclose(ca.conj().to_numpy(), np.conj(a), atol=1e-6)
        np.testing.assert_allclose(ca.mul_conj(cb).to_numpy(), a * np.conj(b), atol=1e-5)
        np.testing.assert_allclose(np.asarray(ca.abs2()), np.abs(a) ** 2, rtol=1e-5)
        np.testing.assert_allclose(ops.cdiv(ca, cb).to_numpy(), a / b,
                                   rtol=1e-4, atol=1e-5)

    def test_cmatmul_matches_numpy(self, rng):
        a = crandn(rng, (8, 16))
        b = crandn(rng, (16, 4))
        got = ops.cmatmul(CArray.from_numpy(a), CArray.from_numpy(b)).to_numpy()
        np.testing.assert_allclose(got, a @ b, atol=1e-4)

    def test_jit_transparent(self, rng):
        """CArray is a pytree: passes through jit as arg and return."""
        a = crandn(rng, (4, 8))
        f = jax.jit(lambda z: (z * z).conj())
        got = f(CArray.from_numpy(a)).to_numpy()
        np.testing.assert_allclose(got, np.conj(a * a), atol=1e-4)


class TestFFT:
    @pytest.mark.parametrize("impl", ["xla", "matmul", "four_step"])
    @pytest.mark.parametrize("n", [64, 128, 1024])
    def test_forward_matches_numpy(self, rng, impl, n):
        x = crandn(rng, (3, 4, n))
        got = jax.jit(ops.get_fft(impl))(CArray.from_numpy(x)).to_numpy()
        want = np.fft.fft(x, axis=-1)
        scale = np.max(np.abs(want))
        np.testing.assert_allclose(got / scale, want / scale, atol=2e-5)

    @pytest.mark.parametrize("impl", ["xla", "matmul", "four_step"])
    def test_inverse_is_unnormalized(self, rng, impl):
        """IFFT convention == FFTW_BACKWARD == np.fft.ifft * N."""
        n = 128
        x = crandn(rng, (2, n))
        got = jax.jit(ops.get_ifft(impl))(CArray.from_numpy(x)).to_numpy()
        want = np.fft.ifft(x, axis=-1) * n
        np.testing.assert_allclose(got, want, atol=2e-4)

    @pytest.mark.parametrize("impl", ["matmul", "four_step"])
    def test_roundtrip(self, rng, impl):
        n = 256
        x = crandn(rng, (5, n))
        y = ops.get_ifft(impl)(ops.get_fft(impl)(CArray.from_numpy(x)))
        np.testing.assert_allclose(y.to_numpy() / n, x, atol=2e-4)

    def test_odd_batch_shapes(self, rng):
        """1023-free internal contract: hot FFTs always run at full width,
        but batch dims may be ragged (e.g. 101 symbols x 16 antennas)."""
        x = crandn(rng, (101, 16, 64))
        got = ops.get_fft("four_step")(CArray.from_numpy(x)).to_numpy()
        np.testing.assert_allclose(got, np.fft.fft(x, axis=-1), atol=2e-4)


class TestShifts:
    @pytest.mark.parametrize("n", [63, 1023, 64, 1024])
    def test_match_golden(self, rng, n):
        x = crandn(rng, (2, n))
        cx = CArray.from_numpy(x)
        np.testing.assert_array_equal(ops.pilot_shift(cx).to_numpy(),
                                      dsp.pilot_shift(x))
        np.testing.assert_array_equal(ops.output_shift(cx).to_numpy(),
                                      dsp.output_shift(x))


class TestLSAndMRC:
    def test_estimate_matches_golden(self, rng):
        a, f = 8, 256
        pilot_td = crandn(rng, (a, f))
        pilot_x = np.exp(2j * np.pi * rng.random(f - 1)).astype(np.complex64)

        want_hconj, want_hsqrd = dsp.estimate_channel(pilot_td, pilot_x)

        x_full = ops.pad_pilot(pilot_x)
        pf = ops.get_fft("four_step")(CArray.from_numpy(pilot_td))
        hconj, hsqrd = jax.jit(ops.estimate_channel_full)(pf, x_full)
        np.testing.assert_allclose(hconj.to_numpy()[:, 1:], want_hconj,
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(hsqrd)[1:], want_hsqrd, rtol=2e-4)
        # DC masking contract
        assert np.all(hconj.to_numpy()[:, 0] == 0)
        assert np.asarray(hsqrd)[0] == 1.0

    def test_mrc_matches_golden(self, rng):
        a, f, s = 8, 256, 6
        pilot_td = crandn(rng, (a, f))
        data_td = crandn(rng, (s, a, f))
        pilot_x = np.exp(2j * np.pi * rng.random(f - 1)).astype(np.complex64)

        want_hconj, want_hsqrd = dsp.estimate_channel(pilot_td, pilot_x)
        want = np.stack([dsp.demod_symbol(data_td[i], want_hconj, want_hsqrd)
                         for i in range(s)])

        x_full = ops.pad_pilot(pilot_x)
        fft = ops.get_fft("four_step")
        hconj, hsqrd = ops.estimate_channel_full(fft(CArray.from_numpy(pilot_td)), x_full)
        eq = ops.mrc_combine(fft(CArray.from_numpy(data_td)), hconj, hsqrd)
        got = ops.finalize(eq).to_numpy()
        np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


class TestModulate:
    def test_matches_golden(self, rng):
        f, cp = 128, 16
        data = crandn(rng, (4, f - 1))
        got = ops.modulate.modulate(CArray.from_numpy(data), cp=cp).to_numpy()
        want = dsp.modulate_symbol(data, cp=cp)
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestZF:
    def test_matches_golden(self, rng):
        s, u, a = 17, 4, 12
        h = crandn(rng, (s, u, a))
        got = jax.jit(ops.zf.zf_precoder)(CArray.from_numpy(h)).to_numpy()
        want = dsp.zf_precoder(h)
        np.testing.assert_allclose(got, want, atol=2e-3)

    def test_apply_matches_golden(self, rng):
        s, u, a = 9, 4, 8
        w = crandn(rng, (s, a, u))
        x = crandn(rng, (u, s))
        got = ops.zf.apply_precoder(CArray.from_numpy(w), CArray.from_numpy(x)).to_numpy()
        np.testing.assert_allclose(got, dsp.apply_precoder(w, x), atol=1e-4)
