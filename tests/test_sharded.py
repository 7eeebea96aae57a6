"""Multi-device row-sharded queries on a virtual 8-device CPU mesh.

New capability with no reference counterpart (SURVEY.md §2 "Parallelism"):
the corpus is row-sharded over a `jax.sharding.Mesh`, per-shard top-k
candidates merge over the (virtual) interconnect, and results must match the
single-device engine exactly.
"""

import jax
import numpy as np
import pytest

from picovdb_tpu import PicoVectorDB, K_ID, K_METRICS, K_VECTOR
from picovdb_tpu.parallel import make_mesh
from picovdb_tpu.parallel.sharded_query import make_sharded_topk
from picovdb_tpu.utils import normalize_batch
from conftest import make_items

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs multiple (virtual) devices"
)


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape["shard"] == len(jax.devices())
    mesh2 = make_mesh(dp=2)
    assert mesh2.shape["dp"] == 2
    assert mesh2.shape["shard"] == len(jax.devices()) // 2


def test_sharded_topk_matches_single_device(rng):
    mesh = make_mesh()
    nsh = mesh.shape["shard"]
    n, dim, k = 64 * nsh, 16, 7
    vectors = normalize_batch(rng.normal(size=(n, dim)).astype(np.float32))
    queries = normalize_batch(rng.normal(size=(8, dim)).astype(np.float32))
    mask = rng.random(n) > 0.25

    from jax.sharding import NamedSharding, PartitionSpec as P

    v = jax.device_put(vectors, NamedSharding(mesh, P("shard", None)))
    m = jax.device_put(mask, NamedSharding(mesh, P("shard")))
    q = jax.device_put(queries, NamedSharding(mesh, P()))

    fn = make_sharded_topk(mesh, "shard", k)
    vals, idxs = fn(q, v, m)
    vals, idxs = np.asarray(vals), np.asarray(idxs)

    scores = queries @ vectors.T
    scores = np.where(mask[None, :], scores, -np.inf)
    order = np.argsort(-scores, axis=1)[:, :k]
    ovals = np.take_along_axis(scores, order, axis=1)
    np.testing.assert_allclose(vals, ovals, rtol=1e-5, atol=1e-6)
    # returned indices score identically to the oracle's
    for qi in range(8):
        np.testing.assert_allclose(
            scores[qi][idxs[qi]], ovals[qi], rtol=1e-5, atol=1e-6
        )


def test_sharded_engine_matches_unsharded(db_path, rng):
    dim = 16
    items, vecs = make_items(rng, 150, dim, extra=lambda i: {"tag": i % 3})

    db1 = PicoVectorDB(embedding_dim=dim, storage_file=db_path + "_single")
    db1.upsert(items)
    db2 = PicoVectorDB(
        embedding_dim=dim, storage_file=db_path + "_sharded", mesh=make_mesh()
    )
    db2.upsert(items)

    qs = rng.normal(size=(4, dim)).astype(np.float32)
    r1 = db1.query(qs, top_k=6)
    r2 = db2.query(qs, top_k=6)
    assert db2._last_topk_strategy == "sharded_scan"
    for a, b in zip(r1, r2):
        assert [x[K_ID] for x in a] == [x[K_ID] for x in b]
        np.testing.assert_allclose(
            [x[K_METRICS] for x in a], [x[K_METRICS] for x in b], rtol=1e-5
        )


def test_sharded_engine_mutations_and_filters(db_path, rng):
    dim = 16
    db = PicoVectorDB(
        embedding_dim=dim, storage_file=db_path, mesh=make_mesh()
    )
    items, vecs = make_items(rng, 100, dim, extra=lambda i: {"tag": i % 2})
    db.upsert(items)
    db.delete(["id3", "id5"])
    v = rng.normal(size=dim).astype(np.float32)
    db.upsert([{K_ID: "late", "_vector_": v, "tag": 0}])

    res = db.query(v, top_k=3)
    assert res[0][K_ID] == "late"
    resf = db.query(v, top_k=10, where={"tag": 1})
    assert all(r["tag"] == 1 for r in resf)
    assert all(r[K_ID] not in ("id3", "id5") for r in resf)


def test_dp_plus_shard_mesh(rng):
    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 devices")
    mesh = make_mesh(dp=2)
    nsh = mesh.shape["shard"]
    n, dim, k = 32 * nsh, 16, 5
    vectors = normalize_batch(rng.normal(size=(n, dim)).astype(np.float32))
    queries = normalize_batch(rng.normal(size=(16, dim)).astype(np.float32))
    mask = np.ones(n, dtype=bool)

    from jax.sharding import NamedSharding, PartitionSpec as P

    v = jax.device_put(vectors, NamedSharding(mesh, P("shard", None)))
    m = jax.device_put(mask, NamedSharding(mesh, P("shard")))
    q = jax.device_put(queries, NamedSharding(mesh, P("dp", None)))

    fn = make_sharded_topk(mesh, "shard", k)
    vals, idxs = fn(q, v, m)
    scores = queries @ vectors.T
    order = np.argsort(-scores, axis=1)[:, :k]
    ovals = np.take_along_axis(scores, order, axis=1)
    np.testing.assert_allclose(np.asarray(vals), ovals, rtol=1e-5, atol=1e-6)


def test_sharded_pallas_kernel_matches_oracle(rng):
    """The production multi-chip path — fused Pallas kernel inside
    shard_map (check_vma skipped) — against the NumPy oracle (VERDICT r1:
    this path previously had zero coverage)."""
    mesh = make_mesh()
    nsh = mesh.shape["shard"]
    n, dim, k = 128 * nsh, 128, 6
    vectors = normalize_batch(rng.normal(size=(n, dim)).astype(np.float32))
    queries = normalize_batch(rng.normal(size=(8, dim)).astype(np.float32))
    mask = rng.random(n) > 0.25

    from jax.sharding import NamedSharding, PartitionSpec as P

    v = jax.device_put(vectors, NamedSharding(mesh, P("shard", None)))
    m = jax.device_put(mask, NamedSharding(mesh, P("shard")))
    q = jax.device_put(queries, NamedSharding(mesh, P()))

    fn = make_sharded_topk(mesh, "shard", k, use_pallas=True, interpret=True)
    vals, idxs = map(np.asarray, fn(q, v, m))

    scores = queries @ vectors.T
    scores = np.where(mask[None, :], scores, -np.inf)
    order = np.argsort(-scores, axis=1)[:, :k]
    ovals = np.take_along_axis(scores, order, axis=1)
    np.testing.assert_allclose(vals, ovals, rtol=1e-5, atol=1e-6)
    for qi in range(8):
        np.testing.assert_allclose(
            scores[qi][idxs[qi]], ovals[qi], rtol=1e-5, atol=1e-6
        )


def test_sharded_engine_fused_scan_mode(db_path, rng):
    """Engine-level mesh + scan_mode='fused': the sharded Pallas path must
    agree with the sharded XLA path end to end."""
    dim = 16
    items, vecs = make_items(rng, 160, dim, extra=lambda i: {"tag": i % 3})
    db_x = PicoVectorDB(
        embedding_dim=dim, storage_file=db_path + "_xla", mesh=make_mesh()
    )
    db_x.upsert(items)
    db_p = PicoVectorDB(
        embedding_dim=dim, storage_file=db_path + "_pal", mesh=make_mesh(),
        scan_mode="fused",
    )
    db_p.upsert(items)

    qs = rng.normal(size=(4, dim)).astype(np.float32)
    rx = db_x.query(qs, top_k=5)
    rp = db_p.query(qs, top_k=5)
    assert db_p._last_topk_strategy == "sharded_scan_pallas"
    for a, b in zip(rx, rp):
        assert [x[K_ID] for x in a] == [x[K_ID] for x in b]
        np.testing.assert_allclose(
            [x[K_METRICS] for x in a], [x[K_METRICS] for x in b], rtol=1e-5
        )
    # mutations + filtered queries through the pallas path
    db_p.delete(["id7"])
    rf = db_p.query(qs[0], top_k=10, where={"tag": 1})
    assert all(r["tag"] == 1 and r[K_ID] != "id7" for r in rf)


def test_sharded_incremental_scatter_sync_parity(db_path, rng):
    """Mesh-mode *scatter* sync path at a few thousand rows: a small
    mutation set after the initial full upload must take the incremental
    (donated-scatter) route and keep exact parity with an unsharded store
    (VERDICT r1: this path was untested beyond n<=150)."""
    dim = 32
    n = 4096
    items, vecs = make_items(rng, n, dim)
    db_m = PicoVectorDB(
        embedding_dim=dim, storage_file=db_path + "_m", mesh=make_mesh()
    )
    db_s = PicoVectorDB(embedding_dim=dim, storage_file=db_path + "_s")
    for db in (db_m, db_s):
        db.upsert(items)
        db.query(vecs[0], top_k=1)  # force the initial full upload
    # ~0.5% of rows changed -> below the 20% incremental threshold
    upd = [
        {K_ID: f"id{i}", "_vector_": rng.normal(size=dim).astype(np.float32)}
        for i in range(0, n, 200)
    ]
    dels = ["id7", "id1234"]
    for db in (db_m, db_s):
        db.upsert(upd)
        db.delete(dels)
    q = rng.normal(size=(5, dim)).astype(np.float32)
    rm = db_m.query(q, top_k=8)
    rs = db_s.query(q, top_k=8)
    assert db_m._last_sync_mode == "incremental"
    assert db_m._dev.last_sync_mode == "scatter"
    for a, b in zip(rm, rs):
        assert [x[K_ID] for x in a] == [y[K_ID] for y in b]
        np.testing.assert_allclose(
            [x["_metrics_"] for x in a], [y["_metrics_"] for y in b],
            atol=1e-5,
        )
    assert all(h[K_ID] not in dels for hits in rm for h in hits)


def test_mesh_store_builds_sharded_ivf(db_path, rng):
    """index='ivf' on a mesh store builds the sharded IVF tier (shared
    centroids, per-shard postings — parallel/ivf_mesh.py) instead of the
    single-device mirror, and single-query serving routes through it.
    (Until r3 a mesh store warned and fell back to the sharded exact
    scan; this asserts the replacement is live end-to-end.)"""
    from picovdb_tpu.parallel.ivf_mesh import ShardedIVF

    db = PicoVectorDB(
        embedding_dim=16, storage_file=db_path, mesh=make_mesh(),
        index="ivf", ivf_nlist=4,
    )
    items, vecs = make_items(rng, 64, 16)
    db.upsert(items)
    db.rebuild_index()
    assert isinstance(db._ivf, ShardedIVF)
    res = db.query(vecs[3], top_k=1, ef_search=1000)  # full probe
    assert res[0][K_ID] == "id3"
    assert db._last_topk_strategy == "ivf"


def test_sharded_build_cache_is_bounded():
    """The make_sharded_topk build cache must evict: its keys include
    id(mesh) and the cached fns close over the mesh, so an unbounded dict
    pins every mesh ever queried (plus compiled executables) for the
    process lifetime — a long-lived process recreating meshes leaked to
    OOM through this path (caught by a 43-seed fuzz soak)."""
    import numpy as np

    from picovdb_tpu.parallel import make_mesh
    from picovdb_tpu.parallel import sharded_query as sq

    q = np.zeros((1, 16), dtype=np.float32)
    for i in range(sq._CACHE_MAX + 8):
        mesh = make_mesh()
        fn = sq.make_sharded_topk(mesh, "shard", k=1 + (i % 3))
        v = np.zeros((16, 16), dtype=np.float32)
        m = np.ones((16,), dtype=bool)
        fn(q, v, m)  # builds + runs so executables exist
        assert len(sq._CACHE) <= sq._CACHE_MAX


def test_mesh_device_grow_keeps_append_epoch_incremental(db_path, rng):
    """Bucket-crossing append on a MESH store: the row-sharded planes grow
    in place (pad + reshard over ICI), no host materialization."""
    import jax.numpy as jnp

    from picovdb_tpu.constants import ROW_PAD

    mesh = make_mesh()
    nsh = mesh.devices.size
    base_cap = ROW_PAD * nsh
    dim, n = 8, base_cap - 64
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    db = PicoVectorDB(embedding_dim=dim, storage_file=db_path, mesh=mesh)
    db.ingest_device(jnp.asarray(vecs), ids=[str(i) for i in range(n)],
                     normalize=False)
    assert db._dev.cap == base_cap
    db.query(vecs[0])

    extra = rng.normal(size=(128, dim)).astype(np.float32)
    extra /= np.linalg.norm(extra, axis=1, keepdims=True)
    db.upsert([{K_ID: f"x{i}", K_VECTOR: extra[i]} for i in range(128)])
    assert db.query(extra[2], top_k=1)[0][K_ID] == "x2"
    assert db._last_sync_mode == "incremental"
    assert db._dev.cap > base_cap
    assert db._dev.cap % nsh == 0  # shards stay even
    assert db._host_lazy
    assert db.query(vecs[9], top_k=1)[0][K_ID] == "9"
