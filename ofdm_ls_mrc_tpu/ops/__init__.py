"""JAX op layer: planar complex core, FFT, LS estimation, MRC, ZF, modulation."""

from . import correlate, fft, ls, modulate, mrc, shift, zf  # noqa: F401
from .correlate import find_frame_start, pn_correlate, pn_correlate_sharded
from .cplx import (
    CArray,
    cconcat,
    cdiv,
    ceinsum,
    cmatmul,
    cones,
    cstack,
    csum,
    cwhere,
    czeros,
    from_const,
)
from .fft import FFT_IMPLS, IFFT_IMPLS, default_impl, get_fft, get_ifft
from .ls import estimate_channel_full, pad_pilot
from .modulate import add_cyclic_prefix, drop_cyclic_prefix
from .mrc import finalize, mrc_combine, mrc_numerator
from .shift import output_shift, pilot_shift, tx_shift

__all__ = [
    "CArray",
    "FFT_IMPLS",
    "IFFT_IMPLS",
    "add_cyclic_prefix",
    "cconcat",
    "cdiv",
    "correlate",
    "find_frame_start",
    "pn_correlate",
    "pn_correlate_sharded",
    "ceinsum",
    "cmatmul",
    "cones",
    "cstack",
    "csum",
    "cwhere",
    "czeros",
    "default_impl",
    "drop_cyclic_prefix",
    "estimate_channel_full",
    "fft",
    "finalize",
    "from_const",
    "get_fft",
    "get_ifft",
    "ls",
    "modulate",
    "mrc",
    "mrc_combine",
    "mrc_numerator",
    "output_shift",
    "pad_pilot",
    "pilot_shift",
    "shift",
    "tx_shift",
    "zf",
]
