"""Driver-entry self-provisioning (__graft_entry__._ensure_virtual_devices).

The driver calls dryrun_multichip(8) on a single-chip host; the entry must
provision a virtual 8-device CPU pool even when a too-small backend already
initialized (the risky path: it goes through a backend reset, which round 2
implemented on private jax APIs — these tests pin the behavior so a jax
upgrade that breaks the reset is caught here, not in the driver).

Each case runs in a subprocess with a clean JAX so backend-initialization
state is controlled exactly.
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # 3 subprocesses x fresh-jax 8-device pools

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code: str) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # the conftest's 8-device override must not leak
    env["JAX_PLATFORMS"] = "cpu"  # never touch the real TPU from tests
    return subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd=REPO,
        env=env,
        timeout=300,
    )


def test_ensure_virtual_devices_backend_already_initialized():
    """A 1-device CPU backend is initialized FIRST (jax.devices() call), then
    _ensure_virtual_devices(8) must reset backends and provision 8."""
    r = _run(
        """
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 1)
assert len(jax.devices()) == 1, jax.devices()
import __graft_entry__ as ge
ge._ensure_virtual_devices(8)
n = len(jax.devices())
assert n >= 8, n
print("OK", n)
"""
    )
    assert r.returncode == 0, r.stderr
    assert "OK" in r.stdout


def test_ensure_virtual_devices_fresh_process():
    """No backend initialized yet: provisioning must work without a reset."""
    r = _run(
        """
import jax
import __graft_entry__ as ge
ge._ensure_virtual_devices(8)
n = len(jax.devices())
assert n >= 8, n
print("OK", n)
"""
    )
    assert r.returncode == 0, r.stderr
    assert "OK" in r.stdout


def test_ensure_virtual_devices_noop_when_pool_big_enough():
    """An already-initialized pool of >= n devices is left untouched (no
    reset): live arrays survive the call."""
    r = _run(
        """
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
import jax.numpy as jnp
x = jnp.arange(4) + 1  # allocates on the existing backend
import __graft_entry__ as ge
ge._ensure_virtual_devices(8)
assert int(x.sum()) == 10  # buffer still valid => no backend reset happened
print("OK", len(jax.devices()))
"""
    )
    assert r.returncode == 0, r.stderr
    assert "OK" in r.stdout
