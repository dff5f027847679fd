"""Test configuration: force an 8-device virtual CPU mesh.

All tests run on CPU so they are hermetic and can exercise shard_map /
pjit paths without a TPU slice (SURVEY.md section 4).
"""

import os

# The session environment pins JAX_PLATFORMS=axon (remote TPU tunnel); tests
# must run hermetically on a virtual 8-device CPU mesh, so force-override.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# pytest plugin discovery can import jax before this conftest runs, making
# the env var alone insufficient -- pin the platform on the live config too.
jax.config.update("jax_platforms", "cpu")

import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

REFERENCE = pathlib.Path("/root/reference")


def reference_available() -> bool:
    return REFERENCE.exists()


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (subprocess dryruns etc.)")
