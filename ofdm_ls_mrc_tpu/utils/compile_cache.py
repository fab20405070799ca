"""Persistent XLA compilation cache for the live apps.

The reference pays its (small) warm-up cost once per process via an explicit
cuFFT warm-up plan (gpuLS_main.cu:94-97).  Here the analogous cost is XLA
compilation, and on a remote-compile backend (the axon tunnel) a cold
start of the fused kernel takes minutes -- long enough that a ring MASTER
waiting on the consumer's first read can hit its write deadline
(docs/PERF.md).  JAX's persistent compilation cache keys executables by HLO
hash, so the second process start skips straight to execution.

Opt-in from every app via ``--compile-cache [DIR]`` (or the
``OFDM_COMPILE_CACHE`` env var); never enabled for bench.py, whose R-loop
methodology must time compile-free programs it warmed itself.
"""

from __future__ import annotations

import os
from typing import Optional

DEFAULT_DIR = os.path.join(os.path.expanduser("~"), ".cache",
                           "ofdm_ls_mrc_tpu", "xla")


def enable(path: Optional[str] = None) -> str:
    """Turn on JAX's persistent compilation cache at ``path``.

    Must run before the first compilation (call it before building
    receivers).  Returns the cache directory in use.
    """
    import jax

    path = path or os.environ.get("OFDM_COMPILE_CACHE") or DEFAULT_DIR
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # Live-app warm-ups are dominated by a handful of multi-second remote
    # compiles; cache everything that takes noticeable time.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path


def add_cli(ap) -> None:
    """Attach the shared --compile-cache flag to an argparse parser."""
    ap.add_argument(
        "--compile-cache", nargs="?", const=DEFAULT_DIR, default=None,
        metavar="DIR",
        help="enable JAX's persistent compilation cache (default dir "
             f"{DEFAULT_DIR}; also via OFDM_COMPILE_CACHE env) -- cuts "
             "cold-start warm-up from minutes to seconds on remote-compile "
             "backends")


def maybe_enable_from_args(args) -> Optional[str]:
    """Enable the cache when --compile-cache (or the env var) was given."""
    path = getattr(args, "compile_cache", None) or os.environ.get(
        "OFDM_COMPILE_CACHE")
    if path:
        return enable(path)
    return None
