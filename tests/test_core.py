"""End-to-end behavior: init/upsert/save/reload/query/get/delete.

Mirrors the reference's tests/test_pico_vdb.py:38-193.
"""

import numpy as np

from picovdb_tpu import PicoVectorDB, K_ID, K_METRICS, K_VECTOR
from conftest import make_items


def test_upsert_query_roundtrip(db_path, rng):
    db = PicoVectorDB(embedding_dim=32, storage_file=db_path)
    items, vecs = make_items(rng, 50, 32)
    report = db.upsert(items)
    assert sorted(report["insert"]) == sorted(f"id{i}" for i in range(50))
    assert report["update"] == []

    res = db.query(vecs[3], top_k=5)
    assert res[0][K_ID] == "id3"
    assert res[0][K_METRICS] > 0.999
    assert len(res) == 5

    # re-upsert same ids -> update
    report2 = db.upsert(items[:10])
    assert sorted(report2["update"]) == sorted(f"id{i}" for i in range(10))
    assert report2["insert"] == []


def test_idless_upsert_uses_content_hash(db_path, rng):
    db = PicoVectorDB(embedding_dim=8, storage_file=db_path)
    v = rng.normal(size=8).astype(np.float32)
    rep = db.upsert([{K_VECTOR: v}])
    assert len(rep["insert"]) == 1
    auto_id = rep["insert"][0]
    assert len(auto_id) == 32  # md5 hex
    # same vector -> same id -> update, not insert
    rep2 = db.upsert([{K_VECTOR: v}])
    assert rep2["update"] == [auto_id]
    assert rep2["insert"] == []


def test_batch_query_shapes(db_path, rng):
    db = PicoVectorDB(embedding_dim=16, storage_file=db_path)
    items, vecs = make_items(rng, 30, 16)
    db.upsert(items)
    res = db.query(vecs[:4], top_k=3)
    assert isinstance(res, list) and len(res) == 4
    for qi, hits in enumerate(res):
        assert hits[0][K_ID] == f"id{qi}"
        assert len(hits) == 3


def test_save_reload_roundtrip(db_path, rng):
    db = PicoVectorDB(embedding_dim=16, storage_file=db_path)
    items, vecs = make_items(rng, 20, 16, extra=lambda i: {"tag": i % 2})
    db.upsert(items)
    db.store_additional_data(corpus="unit-test", version=3)
    db.delete(["id5"])
    db.save()

    db2 = PicoVectorDB(embedding_dim=16, storage_file=db_path)
    assert db2.count() == 19
    assert db2.capacity() == 20
    assert db2.get_additional_data() == {"corpus": "unit-test", "version": 3}
    res = db2.query(vecs[7], top_k=1)
    assert res[0][K_ID] == "id7"
    assert res[0]["tag"] == 1
    # deleted id never resurfaces after reload
    res5 = db2.query(vecs[5], top_k=20)
    assert all(r[K_ID] != "id5" for r in res5)
    assert db2.get("id5") is None


def test_delete_returns_only_existing(db_path, rng):
    db = PicoVectorDB(embedding_dim=8, storage_file=db_path)
    items, _ = make_items(rng, 5, 8)
    db.upsert(items)
    removed = db.delete(["id1", "nope", "id3"])
    assert removed == ["id1", "id3"]
    assert db.count() == 3


def test_deleted_slot_is_recycled(db_path, rng):
    db = PicoVectorDB(embedding_dim=8, storage_file=db_path)
    items, _ = make_items(rng, 5, 8)
    db.upsert(items)
    db.delete(["id2"])
    cap_before = db.capacity()
    v = rng.normal(size=8).astype(np.float32)
    db.upsert([{K_ID: "fresh", K_VECTOR: v}])
    assert db.capacity() == cap_before  # reused the free slot, no growth
    assert db.count() == 5
    res = db.query(v, top_k=1)
    assert res[0][K_ID] == "fresh"


def test_better_than_floor(db_path, rng):
    db = PicoVectorDB(embedding_dim=16, storage_file=db_path)
    items, vecs = make_items(rng, 40, 16)
    db.upsert(items)
    res = db.query(vecs[0], top_k=40, better_than=0.999)
    assert [r[K_ID] for r in res] == ["id0"]
    res_all = db.query(vecs[0], top_k=40, better_than=-1.0)
    assert len(res_all) == 40


def test_empty_db_query(db_path, rng):
    db = PicoVectorDB(embedding_dim=8, storage_file=db_path)
    v = rng.normal(size=8).astype(np.float32)
    assert db.query(v) == [[]]  # reference parity: pico_vdb.py:595-596
    assert db.query(np.stack([v, v])) == [[], []]


def test_additional_data_persists(db_path, rng):
    db = PicoVectorDB(embedding_dim=8, storage_file=db_path)
    items, _ = make_items(rng, 3, 8)
    db.upsert(items)
    db.store_additional_data(a=1, b={"nested": [1, 2]})
    db.save()
    db2 = PicoVectorDB(embedding_dim=8, storage_file=db_path)
    assert db2.get_additional_data() == {"a": 1, "b": {"nested": [1, 2]}}


def test_query_one_alias(db_path, rng):
    db = PicoVectorDB(embedding_dim=8, storage_file=db_path)
    items, vecs = make_items(rng, 10, 8)
    db.upsert(items)
    res = db.query_one(vecs[4], top_k=2)
    assert res[0][K_ID] == "id4"
    assert isinstance(res[0], dict)


def test_duplicate_id_within_one_batch(db_path, rng):
    """Last occurrence wins when one upsert batch repeats an id (the
    reference IndexErrors on this, picovdb/pico_vdb.py:429-431)."""
    db = PicoVectorDB(embedding_dim=8, storage_file=db_path)
    v1 = rng.normal(size=8).astype(np.float32)
    v2 = rng.normal(size=8).astype(np.float32)
    rep = db.upsert([
        {K_ID: "dup", K_VECTOR: v1, "gen": 1},
        {K_ID: "dup", K_VECTOR: v2, "gen": 2},
    ])
    assert rep["insert"] == ["dup"]
    assert rep["update"] == ["dup"]
    assert db.count() == 1
    res = db.query(v2, top_k=1)
    assert res[0][K_ID] == "dup"
    assert res[0]["gen"] == 2
    assert res[0][K_METRICS] > 0.999


def test_empty_ids_filter_returns_empty(db_path, rng):
    db = PicoVectorDB(embedding_dim=8, storage_file=db_path)
    items, vecs = make_items(rng, 5, 8)
    db.upsert(items)
    assert db.query(vecs[0], top_k=3, ids=[]) == [[]]
    assert db.query(vecs[:2], top_k=3, ids=[]) == [[], []]


def test_get_all_both_flags(db_path, rng):
    db = PicoVectorDB(embedding_dim=8, storage_file=db_path)
    items, _ = make_items(rng, 4, 8)
    db.upsert(items)
    db.delete(["id2"])
    recs = db.get_all(include_vector=True, include_deleted=True)
    assert len(recs) == 4
    for r in recs:
        if r[K_ID] == "id2":
            assert K_VECTOR not in r  # deleted placeholder stays bare
        else:
            assert r[K_VECTOR].shape == (8,)
