"""Test harness: run everything on an 8-device virtual CPU mesh.

Mirrors the reference's strategy of simulating multi-node on one host
(`tests/common_fixture.py:108-124` spawns processes; with JAX we just ask XLA
for 8 host devices and shard over them in-process).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force off the real TPU for tests
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

# The sandbox's sitecustomize imports jax (registering the live TPU backend)
# before conftest runs, so env vars alone are too late — override via config.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _reset_global_context():
    """Each test gets a fresh global parallel context."""
    from internevo_tpu.core.context import gpc
    from internevo_tpu.core.config import Config
    from internevo_tpu.parallel import sharding

    gpc.config = Config()
    gpc.mesh = None
    gpc.sizes = None
    gpc.tensor_mode = "mtp"
    sharding.set_rules(sharding.ShardingRules())
    yield


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "heavy: multi-minute equivalence/e2e tests; deselect with -m quick "
        "(alias for -m 'not heavy') for the <5 min inner-loop tier")


def pytest_collection_modifyitems(config, items):
    # `-m quick` tier: translate into 'not heavy' at collection time
    markexpr = config.getoption("-m", default="")
    if markexpr == "quick":
        config.option.markexpr = "not heavy"
