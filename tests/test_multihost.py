"""Two-process jax.distributed validation (subprocess driver).

Runs tools/multihost_test.py: two workers, 4 virtual CPU devices each,
halo exchange + the hybrid path's all_gather/all_to_all crossing the
process boundary. The reference has no distributed tests (SURVEY §4).
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_multihost():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)          # workers set their own
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "multihost_test.py")],
        env=env, capture_output=True, text=True, timeout=280)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert "ALL PASS" in r.stdout
