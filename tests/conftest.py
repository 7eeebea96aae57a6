"""Test configuration: run the whole suite on a virtual 8-device CPU mesh.

The env vars must be set before JAX initializes its backends, which is why
this happens at conftest import time. This is the multi-device testing
strategy the reference lacks (SURVEY.md §4 implication (c)): sharding
semantics are validated without a real TPU pod via
`--xla_force_host_platform_device_count`.
"""

import os
import sys

# Force CPU regardless of the ambient platform (the driver environment may
# preset JAX_PLATFORMS=axon/tpu): the suite validates semantics and sharding
# on a virtual mesh; device-specific benchmarks run outside pytest.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment may have imported jax at interpreter startup (e.g. a TPU
# plugin registered via sitecustomize), in which case the env vars above were
# captured too late — override the live config before any backend initializes.
if "jax" in sys.modules:
    import jax

    jax.config.update("jax_platforms", "cpu")
    assert not jax._src.xla_bridge._backends, (
        "a JAX backend initialized before tests/conftest.py could force CPU; "
        "run pytest with JAX_PLATFORMS=cpu"
    )

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Explicit opt-in for the differential tests against the reference checkout
# (tests/test_reference_compat.py): importing third-party code from a fixed
# path is gated behind PICOVDB_REFERENCE_DIR, and only THIS repo's conftest
# opts in to the known development-environment location. Elsewhere the env
# var stays unset and those tests skip.
if os.path.isdir("/root/reference/picovdb"):
    os.environ.setdefault("PICOVDB_REFERENCE_DIR", "/root/reference")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def db_path(tmp_path):
    """Fresh storage base path per test (mirrors the reference's tmp_path use)."""
    return str(tmp_path / "testdb")


def make_items(rng, n, dim, prefix="id", extra=None):
    from picovdb_tpu import K_ID, K_VECTOR

    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    items = []
    for i in range(n):
        item = {K_ID: f"{prefix}{i}", K_VECTOR: vecs[i]}
        if extra:
            item.update(extra(i))
        items.append(item)
    return items, vecs


@pytest.fixture
def item_factory():
    return make_items
