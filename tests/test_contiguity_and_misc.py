"""Storage invariants and API ergonomics odds-and-ends.

Mirrors tests/test_task17_float32_contiguity.py and parts of
tests/test_api_ergonomics.py of the reference.
"""

import numpy as np

from picovdb_tpu import PicoVectorDB, K_ID, K_METRICS, K_VECTOR, Float
from conftest import make_items


def test_host_matrix_stays_c_contiguous_f32(db_path, rng):
    db = PicoVectorDB(embedding_dim=8, storage_file=db_path)
    items, _ = make_items(rng, 10, 8)
    db.upsert(items)
    assert db._host_vectors.dtype == Float
    assert db._host_vectors.flags["C_CONTIGUOUS"]
    db.delete(["id2"])
    db.upsert([{K_ID: "n", K_VECTOR: rng.normal(size=8).astype(np.float64)}])
    assert db._host_vectors.dtype == Float
    assert db._host_vectors.flags["C_CONTIGUOUS"]
    db.vacuum()
    assert db._host_vectors.dtype == Float
    assert db._host_vectors.flags["C_CONTIGUOUS"]


def test_upsert_accepts_lists_and_f64(db_path):
    db = PicoVectorDB(embedding_dim=4, storage_file=db_path)
    db.upsert([{K_ID: "a", K_VECTOR: [1.0, 2.0, 3.0, 4.0]}])
    db.upsert([{K_ID: "b", K_VECTOR: np.arange(4, dtype=np.float64)}])
    assert db.count() == 2
    rec = db.get("a", include_vector=True)
    assert rec[K_VECTOR].dtype == Float


def test_stored_vectors_are_normalized(db_path, rng):
    db = PicoVectorDB(embedding_dim=8, storage_file=db_path)
    v = 100.0 * rng.normal(size=8).astype(np.float32)
    db.upsert([{K_ID: "big", K_VECTOR: v}])
    rec = db.get("big", include_vector=True)
    np.testing.assert_allclose(np.linalg.norm(rec[K_VECTOR]), 1.0, rtol=1e-6)
    res = db.query(v, top_k=1)
    assert res[0][K_METRICS] > 0.999


def test_update_changes_vector_and_metadata(db_path, rng):
    db = PicoVectorDB(embedding_dim=8, storage_file=db_path)
    items, vecs = make_items(rng, 5, 8, extra=lambda i: {"v": 1})
    db.upsert(items)
    new_vec = rng.normal(size=8).astype(np.float32)
    db.upsert([{K_ID: "id1", K_VECTOR: new_vec, "v": 2}])
    assert db.count() == 5
    res = db.query(new_vec, top_k=1)
    assert res[0][K_ID] == "id1"
    assert res[0]["v"] == 2
    # old direction no longer matches id1 strongly
    res_old = db.query(vecs[1], top_k=5)
    top = [r[K_ID] for r in res_old]
    assert top[0] != "id1" or res_old[0][K_METRICS] < 0.9


def test_metrics_are_python_floats(db_path, rng):
    db = PicoVectorDB(embedding_dim=8, storage_file=db_path)
    items, vecs = make_items(rng, 5, 8)
    db.upsert(items)
    res = db.query(vecs[0], top_k=3)
    for r in res:
        assert type(r[K_METRICS]) is float


def test_stats_after_save_includes_file_sizes(db_path, rng):
    db = PicoVectorDB(embedding_dim=8, storage_file=db_path)
    items, _ = make_items(rng, 5, 8)
    db.upsert(items)
    db.save()
    sizes = db.stats()["file_sizes"]
    base = db_path.split("/")[-1]
    assert sizes[f"{base}.vecs.npy"] >= 5 * 8 * 4
    assert sizes[f"{base}.ids.json"] > 0
    assert sizes[f"{base}.meta.json"] > 0


def test_len_tracks_active(db_path, rng):
    db = PicoVectorDB(embedding_dim=8, storage_file=db_path)
    assert len(db) == 0
    items, _ = make_items(rng, 4, 8)
    db.upsert(items)
    assert len(db) == 4
    db.delete(["id0", "id1"])
    assert len(db) == 2


def test_query_on_reloaded_store_without_mutation(db_path, rng):
    """Constructor's eager device upload serves queries with no sync epoch."""
    db = PicoVectorDB(embedding_dim=8, storage_file=db_path)
    items, vecs = make_items(rng, 12, 8)
    db.upsert(items)
    db.save()
    db2 = PicoVectorDB(embedding_dim=8, storage_file=db_path)
    assert not db2._dirty
    res = db2.query(vecs[3], top_k=1)
    assert res[0][K_ID] == "id3"
