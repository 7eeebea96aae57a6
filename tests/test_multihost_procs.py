"""True multi-process distributed test: 2 OS processes x 2 virtual CPU
devices, Gloo-backed collectives through `jax.distributed`.

The reference has no distributed layer at all (SURVEY.md §2); this test
exercises the real multi-host code path — `init_distributed`, `pod_mesh`,
per-host sharded checkpoint loading (`load_host_shard` over a
`save(shards=N)` layout), and a cross-process sharded top-k merge — not
the single-process degenerate form (tests/test_multihost.py).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from picovdb_tpu import PicoVectorDB, K_ID, K_VECTOR

NPROCS = 2
DIM = 16
N = 64


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.parametrize(
    "mode",
    ["exact", "i4", "ivf", "ivf8", "engine", "engine_i8", "engine_odd"],
)
def test_two_process_sharded_query(tmp_path, mode):
    """exact: the f32 merge. i4: the packed-nibble int4 STORAGE lane.
    ivf: ShardedIVF build + search + an INCREMENTAL update() epoch.
    ivf8: the int8-only layout + an in-place frozen-scale requantize
    epoch — all across 2 real OS processes (VERDICT r3 item 5).
    engine: a full PicoVectorDB per process — shard-local load, queries,
    mutations, batched getters, distributed save + reload (VERDICT r4
    item 4). engine_i8: int8 DEVICE storage across processes — the
    distributed save must write dequantized f32 shards (r5 review)."""
    base = str(tmp_path / "mhstore")
    rng = np.random.default_rng(0)
    # engine_odd: a row count NOT divisible by the process count — the
    # ceil split writes a smaller last shard, and the distributed load
    # must pass an explicit global_shape (r5 review: without it each
    # process inferred a different global row count)
    n_build = N + 1 if mode == "engine_odd" else N
    vecs = rng.standard_normal((n_build, DIM)).astype(np.float32)
    db = PicoVectorDB(embedding_dim=DIM, storage_file=base)
    db.upsert([{K_ID: f"r{i}", K_VECTOR: vecs[i]} for i in range(n_build)])
    db.save(shards=NPROCS)

    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("PYTHONPATH", "")
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep + env["PYTHONPATH"]
    )
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), str(NPROCS), str(port),
             base, str(DIM), mode],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for pid in range(NPROCS)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=150)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"MH OK pid={pid} mode={mode}" in out, out
