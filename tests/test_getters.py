"""Getter surface: get / get_by_id / get_all with include flags.

Mirrors tests/test_task6_getters_include_vector.py,
test_task7_get_all_include_deleted.py and test_task32_get_consolidation.py.
"""

import numpy as np
import pytest

from picovdb_tpu import PicoVectorDB, K_ID, K_VECTOR
from conftest import make_items


def test_get_single_and_batch(db_path, rng):
    db = PicoVectorDB(embedding_dim=8, storage_file=db_path)
    items, _ = make_items(rng, 5, 8, extra=lambda i: {"n": i})
    db.upsert(items)
    rec = db.get("id2")
    assert rec[K_ID] == "id2" and rec["n"] == 2
    assert K_VECTOR not in rec
    assert db.get("missing") is None

    recs = db.get(["id1", "missing", "id3"])
    assert [r[K_ID] for r in recs] == ["id1", "id3"]


def test_get_include_vector_normalized(db_path, rng):
    db = PicoVectorDB(embedding_dim=8, storage_file=db_path)
    items, _ = make_items(rng, 3, 8)
    db.upsert(items)
    rec = db.get("id0", include_vector=True)
    v = rec[K_VECTOR]
    assert v.dtype == np.float32
    assert v.shape == (8,)
    np.testing.assert_allclose(np.linalg.norm(v), 1.0, rtol=1e-6)
    # returned vector is a copy, not a view into the store
    v[:] = 0
    rec2 = db.get("id0", include_vector=True)
    assert np.linalg.norm(rec2[K_VECTOR]) > 0.9


def test_get_by_id_deprecated(db_path, rng):
    db = PicoVectorDB(embedding_dim=8, storage_file=db_path)
    items, _ = make_items(rng, 2, 8)
    db.upsert(items)
    with pytest.deprecated_call():
        rec = db.get_by_id("id1")
    assert rec[K_ID] == "id1"
    with pytest.deprecated_call():
        assert db.get_by_id("missing") is None


def test_get_all_active_only(db_path, rng):
    db = PicoVectorDB(embedding_dim=8, storage_file=db_path)
    items, _ = make_items(rng, 5, 8)
    db.upsert(items)
    db.delete(["id2"])
    recs = db.get_all()
    assert {r[K_ID] for r in recs} == {"id0", "id1", "id3", "id4"}
    assert all(K_VECTOR not in r for r in recs)


def test_get_all_include_deleted_placeholders(db_path, rng):
    db = PicoVectorDB(embedding_dim=8, storage_file=db_path)
    items, _ = make_items(rng, 4, 8)
    db.upsert(items)
    db.delete(["id1"])
    recs = db.get_all(include_deleted=True)
    assert len(recs) == 4
    placeholder = [r for r in recs if r[K_ID] == "id1"][0]
    assert set(placeholder.keys()) == {K_ID}


def test_get_all_include_vector(db_path, rng):
    db = PicoVectorDB(embedding_dim=8, storage_file=db_path)
    items, _ = make_items(rng, 3, 8)
    db.upsert(items)
    recs = db.get_all(include_vector=True)
    for r in recs:
        assert r[K_VECTOR].shape == (8,)
        np.testing.assert_allclose(np.linalg.norm(r[K_VECTOR]), 1.0, rtol=1e-6)
