"""Test env: force CPU backend with 8 virtual devices so sharding tests run
without TPU hardware. Must run before jax is imported anywhere."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Force the CPU backend: the ambient environment may point JAX_PLATFORMS at
# real TPU hardware (e.g. a tunneled chip), which must never be used for
# unit tests.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_ENABLE_X64"] = "1"

# The ambient sitecustomize may register a hardware backend and force
# jax_platforms past the env var; the config update below wins (backends
# initialize lazily, so doing this at conftest import time is early enough).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running integration tests (multi-process dryruns)")
