"""Driver-contract tests for __graft_entry__ (the round-1 red artifact).

The driver calls dryrun_multichip(n) in an environment whose JAX backend may
already be initialized on a single TPU; the function must self-provision an
n-device virtual CPU mesh (in-process when possible, else subprocess).
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft


def test_ensure_virtual_devices_inprocess():
    # conftest provisions 8 virtual CPU devices before jax init
    assert graft._ensure_virtual_devices(8)
    assert not graft._ensure_virtual_devices(9)  # more than exist -> subprocess


def test_dryrun_multichip_small_mesh():
    # 2-device dp=1 x sp=2 mesh: exercises the full sharded pipeline cheaply
    graft.dryrun_multichip(2)
