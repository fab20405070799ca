"""Shared loader for the repo's native C++ libraries.

One definition of the build-on-demand policy (rebuild via ``make -s -C
native`` whenever the .so is missing or older than its source) for all
three bindings -- io/ring.py, io/native_dsp.py, io/native_sync.py -- so a
staleness-rule fix lands in one place.  Callers keep their own CDLL cache,
lock, and ctypes signature registration.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
NATIVE_DIR = os.path.join(REPO_ROOT, "native")


def load_native(so_name: str, src_rel: str,
                optional: bool = False) -> Optional[ctypes.CDLL]:
    """Load ``native/build/<so_name>``, rebuilding first when missing/stale.

    Args:
      so_name:  library file name under native/build/.
      src_rel:  source path relative to native/ used for the mtime
                staleness check.
      optional: True -> return None when the toolchain or build is
                unavailable (callers fall back to a NumPy oracle);
                False -> let the build/load error propagate.
    """
    so_path = os.path.join(NATIVE_DIR, "build", so_name)
    src_path = os.path.join(NATIVE_DIR, src_rel)
    try:
        if (not os.path.exists(so_path)
                or os.path.getmtime(so_path) < os.path.getmtime(src_path)):
            subprocess.run(["make", "-s", "-C", NATIVE_DIR], check=True)
        return ctypes.CDLL(so_path)
    except (OSError, subprocess.CalledProcessError):
        if optional:
            return None
        raise
