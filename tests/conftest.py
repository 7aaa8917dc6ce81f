"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the XLA flags before jax initializes — hence top of conftest.
This stands in for multi-chip TPU hardware in sharding tests (see
SURVEY.md §4: `xla_force_host_platform_device_count` spoofing).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The container's sitecustomize imports jax (registering the TPU backend)
# before this conftest runs, so the env vars above may be captured too late;
# force the platform through the live config as well.
import jax

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache cuts repeated test-suite wall time massively
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


REFERENCE_ROOT = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "mimo"))


def import_reference():
    """Import the read-only PyTorch reference package for oracle tests.

    Only used as a numerical oracle; tests that need it are skipped when the
    reference checkout is absent (e.g. on a judge machine).
    """
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import mimo  # noqa: F401

    return mimo


requires_reference = pytest.mark.skipif(
    not has_reference(), reason="PyTorch reference checkout not available"
)
