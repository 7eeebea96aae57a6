"""Lazy id->slot map: bulk lanes skip the dict build, point lookups
materialize it.

At 25M rows the `_id2idx` dict costs ~50-100 s of pure CPython during
`ingest_device` while serving never reads it (queries map hits through
the cached `_ids_np` object array). These tests pin the laziness contract:
which operations must NOT materialize the map, which do, and that the
materialized map always equals the eager ground truth. Reference
behavior being preserved: the id bookkeeping of picovdb/pico_vdb.py
(_id2idx at pico_vdb.py:141, rebuilt at 246-252).
"""

import numpy as np
import pytest

from picovdb_tpu import PicoVectorDB


def _expected_map(db):
    ids = db._ids
    return {ids[i]: i for i in db._active_indices.tolist()}


def _vecs(n, dim, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, dim)).astype(np.float32)


def test_columnar_fresh_lane_is_lazy_and_serving_stays_lazy(tmp_path):
    db = PicoVectorDB(embedding_dim=64, storage_file=str(tmp_path / "db"))
    ids = [f"id{i}" for i in range(50)]
    db.upsert_columnar(_vecs(50, 64), ids=ids)
    assert db._id2idx_store is None

    # counting / len / stats / queries never build the map
    assert db.count() == 50
    assert len(db) == 50
    assert db.stats()["active"] == 50
    res = db.query(_vecs(1, 64, seed=1)[0], top_k=5)
    assert len(res) == 5
    res2 = db.query_batched(_vecs(4, 64, seed=2), top_k=3)
    assert len(res2) == 4
    assert db._id2idx_store is None

    # a point lookup materializes it, correctly
    got = db.get("id7")
    assert got is not None and got["_id_"] == "id7"
    assert db._id2idx_store is not None
    assert db._id2idx_store == _expected_map(db)


def test_load_is_lazy_and_delete_materializes(tmp_path):
    path = str(tmp_path / "db")
    db = PicoVectorDB(embedding_dim=32, storage_file=path)
    ids = [f"v{i}" for i in range(20)]
    db.upsert_columnar(_vecs(20, 32), ids=ids)
    db.delete(["v3", "v11"])
    db.save()

    db2 = PicoVectorDB(embedding_dim=32, storage_file=path)
    assert db2._id2idx_store is None
    assert db2.count() == 18

    removed = db2.delete(["v4"])
    assert removed == ["v4"]
    assert db2.count() == 17
    assert db2._id2idx_store == _expected_map(db2)
    assert "v3" not in db2._id2idx
    assert "v4" not in db2._id2idx


def test_upsert_after_lazy_ingest_dedupes_correctly(tmp_path):
    db = PicoVectorDB(embedding_dim=16, storage_file=str(tmp_path / "db"))
    ids = [f"a{i}" for i in range(10)]
    db.upsert_columnar(_vecs(10, 16), ids=ids)
    assert db._id2idx_store is None

    # update-in-place of a known id plus one genuinely new id
    rep = db.upsert(
        [
            {"_id_": "a5", "_vector_": _vecs(1, 16, seed=5)[0], "tag": "new"},
            {"_id_": "b0", "_vector_": _vecs(1, 16, seed=6)[0]},
        ]
    )
    assert rep["update"] == ["a5"]
    assert rep["insert"] == ["b0"]
    assert db.count() == 11
    assert db._id2idx == _expected_map(db)
    assert db.get("a5")["tag"] == "new"


def test_vacuum_leaves_map_lazy_and_consistent(tmp_path):
    db = PicoVectorDB(embedding_dim=16, storage_file=str(tmp_path / "db"))
    ids = [f"x{i}" for i in range(12)]
    db.upsert_columnar(_vecs(12, 16), ids=ids)
    db.delete(["x0", "x7"])
    db.vacuum()
    assert db._id2idx_store is None
    assert db.count() == 10
    # map rebuilds densely over the compacted order
    m = db._id2idx
    assert m == _expected_map(db)
    assert sorted(m.values()) == list(range(10))
    assert "x0" not in m and "x7" not in m


def test_vacuum_fixed_capacity_lazy_map(tmp_path):
    db = PicoVectorDB(
        embedding_dim=16, storage_file=str(tmp_path / "db"), capacity=16
    )
    ids = [f"c{i}" for i in range(8)]
    db.upsert_columnar(_vecs(8, 16), ids=ids)
    db.delete(["c2"])
    db.vacuum()
    assert db.count() == 7
    assert db._id2idx == _expected_map(db)
    # the freed tail still accepts inserts up to capacity
    db.upsert([{"_id_": "fresh", "_vector_": _vecs(1, 16, seed=9)[0]}])
    assert db.count() == 8


def test_ingest_device_is_lazy(tmp_path):
    db = PicoVectorDB(embedding_dim=64, storage_file=str(tmp_path / "db"))
    import jax.numpy as jnp

    vecs = jnp.asarray(_vecs(32, 64))
    ids = [f"d{i}" for i in range(32)]
    db.ingest_device(vecs, ids=ids)
    assert db._id2idx_store is None
    assert db.count() == 32
    res = db.query(_vecs(1, 64, seed=3)[0], top_k=4)
    assert len(res) == 4
    assert db._id2idx_store is None
    assert db.get("d9")["_id_"] == "d9"
    assert db._id2idx_store == _expected_map(db)
