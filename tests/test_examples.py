"""Every example in examples/ must run clean on CPU and report OK.

Examples are user-facing contract surface (the quickstart a reference user
lands on); a broken example is a broken front door.  Each runs in a fresh
subprocess so platform pinning and shm lifecycles stay isolated.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
EXAMPLES = sorted(
    f for f in os.listdir(os.path.join(REPO, "examples")) if f.endswith(".py"))


def _run(name, *extra):
    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", name), *extra],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)


def test_examples_discovered():
    assert len(EXAMPLES) >= 4


@pytest.mark.parametrize("name", EXAMPLES)
def test_example_runs_ok(name):
    extra = () if name.startswith("03") else ("--platform", "cpu")
    r = _run(name, *extra)
    assert r.returncode == 0, f"{name}:\n{r.stdout}\n{r.stderr}"
    assert "OK" in r.stdout, r.stdout
