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


def test_four_process_data_time_grid():
    """4 processes, (data=2, time=4) mesh: BOTH axes span process
    boundaries; hybrid exact path's all_gather/all_to_all cross 2
    process boundaries (VERDICT r2 #4)."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "multihost_test.py"),
         "4"],
        env=env, capture_output=True, text=True, timeout=400)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert "ALL PASS" in r.stdout
