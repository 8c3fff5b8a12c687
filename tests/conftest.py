"""Test config: force JAX onto a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharded-code tests follow the
standard JAX practice of simulating N devices on CPU via
--xla_force_host_platform_device_count (SURVEY.md §4(d)).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    # 9 devices: ≥8 for the (gop=2, tile=4) mesh tests AND exactly 9 so the
    # n_tile=9 (one-MB-row band, hloc=1) tile-sharding case is exercised on
    # the QCIF (hmb=9) fixtures.
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=9"
    ).strip()

# The axon TPU plugin registers even under JAX_PLATFORMS=cpu; the config knob
# is honored, so set it before any backend is initialized.
import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: full conformance sweeps (run with -m slow; excluded by "
        "-m 'not slow')")


@pytest.fixture(scope="session")
def fixtures_dir() -> pathlib.Path:
    return FIXTURES
