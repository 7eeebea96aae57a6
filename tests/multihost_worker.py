"""Worker process for tests/test_multihost_procs.py.

Runs as one of N real OS processes under `jax.distributed` (Gloo-backed CPU
collectives): loads its own shard of a store saved with `save(shards=N)`,
joins the global row-sharded corpus array, and answers a sharded top-k
query whose merge crosses process boundaries.

Usage: python multihost_worker.py <pid> <nprocs> <port> <store_base> <dim>
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main() -> int:
    pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    base, dim = sys.argv[4], int(sys.argv[5])

    from picovdb_tpu.parallel.multihost import (
        init_distributed,
        load_host_shard,
        pod_mesh,
    )
    from picovdb_tpu.parallel.sharded_query import make_sharded_topk
    from picovdb_tpu import persistence

    init_distributed(f"127.0.0.1:{port}", num_processes=nprocs,
                     process_id=pid)
    assert jax.process_count() == nprocs, jax.process_count()
    mesh = pod_mesh(dp=1)

    vectors = load_host_shard(base, dim, mesh)
    n = vectors.shape[0]

    from jax.sharding import NamedSharding, PartitionSpec as P

    local_rows = n // nprocs
    mask = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("shard")), np.ones(local_rows, dtype=bool)
    )

    # oracle from the full matrix (host-side, reading every shard)
    full = np.concatenate(
        [np.load(p) for p in persistence.find_shards(base)]
    )
    rng = np.random.default_rng(7)
    q = rng.standard_normal((3, dim)).astype(np.float32)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    want = np.argsort(-(qn @ full.T), axis=1)[:, :5]

    q_rep = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P()), q
    )
    fn = make_sharded_topk(mesh, "shard", 5)
    vals, idx = fn(q_rep, vectors, mask)
    got = np.asarray(jax.device_get(idx))
    assert got.shape == (3, 5), got.shape
    np.testing.assert_array_equal(got, want)
    vals_np = np.asarray(jax.device_get(vals))
    np.testing.assert_allclose(
        vals_np, np.take_along_axis(qn @ full.T, want, axis=1), atol=1e-5
    )
    print(f"MH OK pid={pid}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
