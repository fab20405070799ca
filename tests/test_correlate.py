"""FFT overlap-save PN correlator vs the reference-exact sliding dot."""

import jax
import numpy as np
import pytest

from ofdm_ls_mrc_tpu.ops.correlate import (
    find_frame_start,
    pn_correlate,
    pn_correlate_sharded,
)
from ofdm_ls_mrc_tpu.ops.cplx import CArray
from ofdm_ls_mrc_tpu.sim.pn import correlate_frame_start, max_len_sequence


def crandn(rng, shape, scale=1.0):
    return (scale * (rng.standard_normal(shape) + 1j * rng.standard_normal(shape))
            ).astype(np.complex64)


def _golden_mags(buf, pn):
    n = buf.size - pn.size + 1
    corr = np.correlate(buf[: n + pn.size - 1], np.conj(pn), mode="valid")
    return np.abs(corr) / pn.size


@pytest.mark.parametrize("n", [2048, 5000])
def test_matches_sliding_dot(rng, n):
    pn = max_len_sequence(255)
    buf = crandn(rng, n, 0.1)
    start = 700
    buf[start:start + pn.size] += pn  # plant the preamble
    got = np.asarray(jax.jit(lambda x: pn_correlate(x, pn))(CArray.from_numpy(buf)))
    want = _golden_mags(buf, pn)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_find_frame_start_matches_host(rng):
    pn = max_len_sequence(255)
    buf = crandn(rng, 4096, 0.05)
    buf[1234:1234 + pn.size] += pn
    want_i, want_pk = correlate_frame_start(buf, pn, thres=0.5)
    got_i, got_pk = find_frame_start(CArray.from_numpy(buf), pn, thres=0.5)
    assert got_i == want_i == 1234
    assert abs(got_pk - want_pk) < 1e-3


def test_no_peak_returns_minus_one(rng):
    pn = max_len_sequence(127)
    buf = crandn(rng, 2048, 0.01)
    i, peak = find_frame_start(CArray.from_numpy(buf), pn, thres=0.9)
    assert i == -1 and peak < 0.9


def test_sharded_matches_single_device(rng):
    """Lag axis sharded over 8 devices; halo moves via one ppermute."""
    from ofdm_ls_mrc_tpu.parallel import make_mesh

    pn = max_len_sequence(255)
    n = 8 * 1024
    buf = crandn(rng, n, 0.1)
    buf[3000:3000 + pn.size] += pn       # peak near a shard boundary
    buf[1024 - 100:1024 - 100 + pn.size] += pn  # peak crossing shard 0/1 halo
    mesh = make_mesh(1, 8)
    x = CArray.from_numpy(buf)
    got = np.asarray(jax.jit(
        lambda v: pn_correlate_sharded(v, pn, mesh, "time"))(x))
    want = _golden_mags(buf, pn)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
