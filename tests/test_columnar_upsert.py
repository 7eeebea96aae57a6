"""upsert_columnar: the bulk-load fast lane must match upsert semantics.

Differential strategy: every behavior is asserted against the dict-based
`upsert` path (reference semantics: picovdb/pico_vdb.py:403-498) on the
same data — IDs, report dicts, query results, filters, capacity errors.
"""

import numpy as np
import pytest

from picovdb_tpu import PicoVectorDB, K_ID, K_METRICS, K_VECTOR


def test_columnar_fresh_matches_dict_upsert(db_path, tmp_path, rng):
    dim, n = 32, 200
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    ids = [f"r{i}" for i in range(n)]

    a = PicoVectorDB(embedding_dim=dim, storage_file=str(tmp_path / "a"))
    a.upsert([{K_ID: ids[i], K_VECTOR: vecs[i]} for i in range(n)])
    b = PicoVectorDB(embedding_dim=dim, storage_file=str(tmp_path / "b"))
    rep = b.upsert_columnar(vecs, ids=ids)
    assert rep["insert"] == ids and not rep["update"]
    assert b.count() == n

    for qi in (0, 57, 199):
        ra = a.query(vecs[qi], top_k=5)
        rb = b.query(vecs[qi], top_k=5)
        assert [h[K_ID] for h in ra] == [h[K_ID] for h in rb]
        np.testing.assert_allclose(
            [h[K_METRICS] for h in ra], [h[K_METRICS] for h in rb],
            rtol=1e-6,
        )
    # stored bytes identical (same normalization path)
    ga, gb = a.get("r3", include_vector=True), b.get("r3", include_vector=True)
    np.testing.assert_array_equal(ga[K_VECTOR], gb[K_VECTOR])


def test_columnar_auto_md5_ids_match_dict_path(tmp_path, rng):
    dim, n = 16, 20
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    a = PicoVectorDB(embedding_dim=dim, storage_file=str(tmp_path / "a"))
    ra = a.upsert([{K_VECTOR: vecs[i]} for i in range(n)])
    b = PicoVectorDB(embedding_dim=dim, storage_file=str(tmp_path / "b"))
    rb = b.upsert_columnar(vecs)
    assert ra["insert"] == rb["insert"]


def test_columnar_updates_and_free_slots(db_path, rng):
    dim, n = 16, 30
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    db = PicoVectorDB(embedding_dim=dim, storage_file=db_path)
    db.upsert_columnar(vecs[:20], ids=[f"x{i}" for i in range(20)])
    db.delete(["x5", "x6"])
    # mixed: 2 updates, 2 free-slot inserts, 1 append
    rep = db.upsert_columnar(
        vecs[20:25],
        ids=["x0", "x1", "n0", "n1", "n2"],
    )
    assert rep["update"] == ["x0", "x1"]
    assert rep["insert"] == ["n0", "n1", "n2"]
    assert db.count() == 21
    # updated vector wins
    r = db.query(vecs[20], top_k=1)
    assert r[0][K_ID] == "x0"
    # free slots were reused (capacity didn't grow by 3)
    assert db.capacity() == 21


def test_columnar_duplicate_ids_last_wins(db_path, rng):
    dim = 16
    vecs = rng.normal(size=(3, dim)).astype(np.float32)
    db = PicoVectorDB(embedding_dim=dim, storage_file=db_path)
    rep = db.upsert_columnar(vecs, ids=["dup", "other", "dup"])
    assert rep["insert"] == ["dup", "other"]
    assert rep["update"] == ["dup"]
    assert db.count() == 2
    assert db.query(vecs[2], top_k=1)[0][K_ID] == "dup"


def test_columnar_metadata_and_filters(db_path, rng):
    dim, n = 16, 40
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    db = PicoVectorDB(embedding_dim=dim, storage_file=db_path)
    db.upsert_columnar(
        vecs,
        ids=[f"m{i}" for i in range(n)],
        metadata=[{"cat": i % 4} for i in range(n)],
    )
    r = db.query(vecs[6], top_k=5, where={"cat": 2})
    assert r[0][K_ID] == "m6"
    assert all(h["cat"] == 2 for h in r)
    # metadata updates refresh the tag index
    db.upsert_columnar(vecs[6:7], ids=["m6"], metadata=[{"cat": 3}])
    r2 = db.query(vecs[6], top_k=5, where={"cat": 2})
    assert all(h[K_ID] != "m6" for h in r2)


def test_columnar_capacity_error_and_validation(db_path, rng):
    dim = 16
    vecs = rng.normal(size=(5, dim)).astype(np.float32)
    db = PicoVectorDB(embedding_dim=dim, storage_file=db_path, capacity=3)
    with pytest.raises(ValueError, match="capacity exceeded"):
        db.upsert_columnar(vecs, ids=[f"c{i}" for i in range(5)])
    db2 = PicoVectorDB(embedding_dim=dim, storage_file=db_path + "b")
    with pytest.raises(ValueError, match="2D"):
        db2.upsert_columnar(vecs[0])
    with pytest.raises(ValueError, match="ids length"):
        db2.upsert_columnar(vecs, ids=["a"])
    with pytest.raises(ValueError, match="metadata length"):
        db2.upsert_columnar(vecs, ids=list("abcde"), metadata=[{}])
    assert db2.upsert_columnar(np.zeros((0, dim), np.float32)) == {
        "update": [], "insert": []
    }


def test_columnar_copy_false_adopts_matrix(db_path, rng):
    dim, n = 16, 50
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    db = PicoVectorDB(embedding_dim=dim, storage_file=db_path)
    db.upsert_columnar(vecs, ids=[str(i) for i in range(n)], copy=False)
    # matrix was normalized in place and adopted as backing storage
    assert db._host_vectors is vecs
    norms = np.linalg.norm(vecs, axis=1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)
    assert db.query(vecs[7], top_k=1)[0][K_ID] == "7"


def test_columnar_persistence_roundtrip(db_path, rng):
    dim, n = 16, 25
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    db = PicoVectorDB(embedding_dim=dim, storage_file=db_path)
    db.upsert_columnar(
        vecs, ids=[f"p{i}" for i in range(n)],
        metadata=[{"tag": i} for i in range(n)],
    )
    db.save()
    db2 = PicoVectorDB(embedding_dim=dim, storage_file=db_path)
    assert db2.count() == n
    r = db2.query(vecs[11], top_k=1)
    assert r[0][K_ID] == "p11" and r[0]["tag"] == 11


def test_columnar_into_capacity_preallocated_store(db_path, rng):
    """Fast lane must not trigger for capacity stores (free-slot machinery)."""
    dim, n = 16, 10
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    db = PicoVectorDB(embedding_dim=dim, storage_file=db_path, capacity=16)
    rep = db.upsert_columnar(vecs, ids=[str(i) for i in range(n)])
    assert len(rep["insert"]) == n
    assert db.count() == n and db.capacity() == 16
    assert db.query(vecs[4], top_k=1)[0][K_ID] == "4"


def test_packed_fetch_roundtrip_and_knob(db_path, rng, monkeypatch):
    """The packed single-buffer fetch must be bit-identical to the split
    fetch (scores travel bitcast through int32, including -inf padding and
    negative scores), and PICOVDB_PACK_FETCH=0 must restore split fetches."""
    import numpy as np
    from picovdb_tpu import PicoVectorDB

    dim = 32
    db = PicoVectorDB(embedding_dim=dim, storage_file=db_path)
    vecs = rng.normal(size=(40, dim)).astype(np.float32)
    db.upsert([{"_vector_": vecs[i], "i": i} for i in range(40)])
    q = rng.normal(size=(5, dim)).astype(np.float32)

    monkeypatch.setenv("PICOVDB_PACK_FETCH", "1")
    ids_p, sc_p = db.query_columnar(q, top_k=50)  # top_k > rows: -inf pad
    rp = db.query(q[0], top_k=3)

    monkeypatch.setenv("PICOVDB_PACK_FETCH", "0")
    ids_s, sc_s = db.query_columnar(q, top_k=50)
    rs = db.query(q[0], top_k=3)

    assert (ids_p == ids_s).all()
    np.testing.assert_array_equal(sc_p, sc_s)  # bit-identical incl. -inf
    assert [x["i"] for x in rp] == [x["i"] for x in rs]
    np.testing.assert_array_equal(
        [x["_metrics_"] for x in rp], [x["_metrics_"] for x in rs]
    )
