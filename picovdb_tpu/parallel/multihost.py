"""Multi-host (pod / multi-slice) bootstrap helpers.

The reference has no distributed story at all (SURVEY.md §2: no NCCL/MPI/
Gloo). Here the single-controller JAX runtime does the heavy lifting; these
helpers wire the store into it:

  * `init_distributed()` — thin wrapper over `jax.distributed.initialize`
    (coordinator discovery via env / TPU metadata), to be called once per
    host process before building meshes.
  * `pod_mesh()` — a (dp, shard) mesh over *all* pod devices, with the
    corpus shard axis laid out over ICI-adjacent devices so the top-k merge
    allgather rides ICI; dp spans slices (DCN) when multi-slice.
  * `load_host_shard()` — each host reads only its own rows from a sharded
    checkpoint (persistence.save_vectors_sharded layout) and participates
    in a global `jax.make_array_from_process_local_data`.

Single-host meshes (the tested path) don't need any of this — see
parallel.mesh.make_mesh.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .. import persistence


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize the JAX distributed runtime (no-op if already up)."""
    import jax

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError:
        # already initialized (or single-process) — fine either way
        pass


def pod_mesh(dp: int = 1, shard_axis: str = "shard", dp_axis: str = "dp"):
    """(dp, shard) mesh over every device in the pod.

    `jax.devices()` in a multi-host program returns the global device list
    ordered so that ICI neighbors are adjacent; keeping the shard axis
    innermost therefore keeps the per-query top-k merge on ICI, with the
    (rare) dp-axis traffic crossing DCN on multi-slice topologies.
    """
    import jax
    from jax.sharding import Mesh

    devices = np.asarray(jax.devices())
    assert devices.size % dp == 0, (devices.size, dp)
    return Mesh(devices.reshape(dp, -1), (dp_axis, shard_axis))


def load_host_shard(base: str, dim: int, mesh, shard_axis: str = "shard"):
    """Assemble the global corpus array from per-host shard files.

    Expects the `save(shards=N)` layout with N == number of processes; each
    host memory-maps only its own file, then the pieces become one global
    row-sharded jax.Array without any host ever holding the full matrix.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    paths = persistence.find_shards(base)
    if not paths:
        raise FileNotFoundError(f"no shard files for {base}")
    pid = jax.process_index()
    if len(paths) != jax.process_count():
        raise ValueError(
            f"{len(paths)} shard files but {jax.process_count()} processes"
        )
    local = np.load(paths[pid], mmap_mode="r")
    if local.ndim != 2 or local.shape[1] != dim:
        raise ValueError(f"shard {paths[pid]} has shape {local.shape}")
    sharding = NamedSharding(mesh, P(shard_axis, None))
    return jax.make_array_from_process_local_data(sharding, np.asarray(local))
