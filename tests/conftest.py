"""Test configuration: run the suite on a virtual 8-device CPU mesh.

This is the standard JAX pattern for testing sharding/mesh code without TPU
hardware (SURVEY.md §4.6): XLA exposes 8 host-CPU devices, so shard_map/pjit
paths execute real collectives.
"""

import os

# Must be set before jax initializes. Force CPU: the ambient environment may
# point JAX at a single real TPU (JAX_PLATFORMS=axon), but the suite needs the
# 8-device virtual CPU mesh and float64 support.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # XLA CPU in-process collectives ABORT the process if all 8 virtual
    # devices don't reach a rendezvous within 40s — a 1-core CI host under
    # load can exceed that legitimately. Raise the watchdog limits.
    flags += (
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
    )
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

# Belt and braces: the env var only works if jax wasn't imported yet (a pytest
# plugin may have imported it); the config update works until first backend use.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"


def pytest_addoption(parser):
    parser.addoption(
        "--runslow",
        action="store_true",
        default=False,
        help="also run tests marked slow (multi-minute compiles on a 1-core host)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute (compile-heavy) test — deselected by default; "
        "run the full suite with --runslow",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow test (pass --runslow to include)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def reference_dir():
    if not os.path.isdir(REFERENCE_DIR):
        pytest.skip("reference data not available")
    return REFERENCE_DIR
