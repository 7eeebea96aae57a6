"""Multi-host helpers, exercised in their single-process degenerate form.

Real pods can't be simulated here (jax.process_count() == 1 under the
virtual CPU mesh), but the shard-file handoff and mesh construction are
process-count-agnostic and testable.
"""

import jax
import numpy as np
import pytest

from picovdb_tpu import persistence
from picovdb_tpu.parallel.multihost import init_distributed, load_host_shard, pod_mesh


def test_pod_mesh_axes():
    mesh = pod_mesh(dp=1)
    assert mesh.shape["shard"] == len(jax.devices())
    assert mesh.shape["dp"] == 1
    if len(jax.devices()) >= 4:
        mesh2 = pod_mesh(dp=2)
        assert mesh2.shape["dp"] == 2


def test_load_host_shard_roundtrip(tmp_path, rng):
    base = str(tmp_path / "mh")
    vectors = rng.normal(size=(64, 16)).astype(np.float32)
    persistence.save_vectors_sharded(base, vectors, n_shards=1)
    mesh = pod_mesh(dp=1)
    arr = load_host_shard(base, 16, mesh)
    assert arr.shape == (64, 16)
    np.testing.assert_allclose(np.asarray(arr), vectors, rtol=1e-6)


def test_load_host_shard_validates(tmp_path, rng):
    base = str(tmp_path / "mh2")
    mesh = pod_mesh(dp=1)
    with pytest.raises(FileNotFoundError):
        load_host_shard(base, 16, mesh)
    persistence.save_vectors_sharded(
        base, rng.normal(size=(8, 4)).astype(np.float32), n_shards=2
    )
    with pytest.raises(ValueError, match="processes"):
        load_host_shard(base, 4, mesh)  # 2 shard files, 1 process


def test_init_distributed_is_safe_single_process():
    # no coordinator in this environment: must not raise or hang
    init_distributed()
