"""Driver-contract tests: __graft_entry__.dryrun_multichip must be hermetic.

The round-1 driver run failed because the dryrun touched the already-
initialized TPU client; the fix re-execs in a subprocess with
JAX_PLATFORMS=cpu + xla_force_host_platform_device_count set before jax
import. This test exercises exactly that subprocess path (slow: a fresh
jax import + tiny-model compile, ~30 s).
"""

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


@pytest.mark.slow
def test_dryrun_multichip_subprocess_hermetic(monkeypatch):
    # poison the parent env the way the driver environment does: an XLA_FLAGS
    # with a *different* device count must be overridden, not appended to.
    monkeypatch.setenv("XLA_FLAGS", "--xla_force_host_platform_device_count=2")
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(4)
