"""Persistent compilation cache wiring (utils/compile_cache)."""

import os
import subprocess
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

_RUN = """
import jax
jax.config.update("jax_platforms", "cpu")
from ofdm_ls_mrc_tpu.utils import compile_cache
d = compile_cache.enable({path!r})
# Small test programs compile in < the 0.5 s production threshold; lower it
# so this smoke populates the cache.
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np
x = jnp.asarray(np.random.default_rng(0).standard_normal((64, 128),
                dtype=np.float32))
jax.jit(lambda v: (v @ v.T).sum())(x).block_until_ready()
print("entries:", sum(len(fs) for _, _, fs in __import__("os").walk(d)))
"""


def _run(path):
    env = {**os.environ, "PYTHONPATH": REPO + os.pathsep
           + os.environ.get("PYTHONPATH", "")}
    r = subprocess.run([sys.executable, "-c", _RUN.format(path=path)],
                       capture_output=True, text=True, env=env, timeout=120)
    assert r.returncode == 0, r.stderr
    return int(r.stdout.strip().rsplit(" ", 1)[-1])


def test_cache_persists_across_processes(tmp_path):
    """First process populates the cache dir; a second process starts with
    the entries already on disk (the cold-start cut for live apps on
    remote-compile backends)."""
    d = str(tmp_path / "xla")
    n1 = _run(d)
    assert n1 > 0, "first process wrote no cache entries"
    n2 = _run(d)
    assert n2 >= n1  # second process reuses (and may add) entries


def test_cli_flag_and_env(tmp_path, monkeypatch):
    """--compile-cache and OFDM_COMPILE_CACHE both reach enable()."""
    import argparse

    from ofdm_ls_mrc_tpu.utils import compile_cache

    ap = argparse.ArgumentParser()
    compile_cache.add_cli(ap)
    ns = ap.parse_args(["--compile-cache", str(tmp_path / "a")])
    assert ns.compile_cache == str(tmp_path / "a")
    ns2 = ap.parse_args(["--compile-cache"])      # bare flag -> default dir
    assert ns2.compile_cache == compile_cache.DEFAULT_DIR
    ns3 = ap.parse_args([])
    assert ns3.compile_cache is None

    calls = {}
    monkeypatch.setattr(compile_cache, "enable",
                        lambda p=None: calls.setdefault("path", p))
    compile_cache.maybe_enable_from_args(ns)
    assert calls["path"] == str(tmp_path / "a")
    calls.clear()
    monkeypatch.setenv("OFDM_COMPILE_CACHE", str(tmp_path / "b"))
    compile_cache.maybe_enable_from_args(ns3)
    assert calls["path"] == str(tmp_path / "b")

    # demod_app's parser carries the flag.
    from ofdm_ls_mrc_tpu.apps.demod_app import build_parser
    assert build_parser().parse_args(["--compile-cache"]).compile_cache
