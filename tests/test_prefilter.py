"""`where` / `ids` prefilter correctness and dict-vs-callable parity.

Mirrors tests/test_task18_prefilter.py and test_task34_prefilter.py of the
reference; also covers this framework's vectorized tag-index fast path
(picovdb_tpu/filters.py) against the naive loop.
"""

import numpy as np

from picovdb_tpu import PicoVectorDB, K_ID, K_METRICS, K_VECTOR
from picovdb_tpu.filters import TagIndex, compile_where_mask
from conftest import make_items


def _db(db_path, rng, n=60, dim=16):
    db = PicoVectorDB(embedding_dim=dim, storage_file=db_path)
    items, vecs = make_items(
        rng, n, dim, extra=lambda i: {"tag": i % 3, "group": f"g{i % 5}"}
    )
    db.upsert(items)
    return db, vecs


def test_dict_eq_filter(db_path, rng):
    db, vecs = _db(db_path, rng)
    res = db.query(vecs[0], top_k=10, where={"tag": 1})
    assert res
    assert all(r["tag"] == 1 for r in res)


def test_dict_in_filter(db_path, rng):
    db, vecs = _db(db_path, rng)
    res = db.query(vecs[0], top_k=20, where={"group": {"$in": ["g0", "g2"]}})
    assert res
    assert all(r["group"] in ("g0", "g2") for r in res)


def test_dict_vs_callable_parity(db_path, rng):
    db, vecs = _db(db_path, rng)
    r_dict = db.query(vecs[7], top_k=8, where={"tag": 2})
    r_call = db.query(vecs[7], top_k=8, where=lambda d: d.get("tag") == 2)
    assert [r[K_ID] for r in r_dict] == [r[K_ID] for r in r_call]
    assert np.allclose(
        [r[K_METRICS] for r in r_dict], [r[K_METRICS] for r in r_call], rtol=1e-6
    )


def test_multikey_dict_is_and(db_path, rng):
    db, vecs = _db(db_path, rng)
    res = db.query(vecs[0], top_k=30, where={"tag": 0, "group": "g0"})
    assert res
    assert all(r["tag"] == 0 and r["group"] == "g0" for r in res)
    r_call = db.query(
        vecs[0], top_k=30, where=lambda d: d["tag"] == 0 and d["group"] == "g0"
    )
    assert [r[K_ID] for r in res] == [r[K_ID] for r in r_call]


def test_ids_prefilter(db_path, rng):
    db, vecs = _db(db_path, rng)
    subset = ["id3", "id17", "id42", "missing"]
    res = db.query(vecs[3], top_k=10, ids=subset)
    got = [r[K_ID] for r in res]
    assert got[0] == "id3"
    assert set(got) <= {"id3", "id17", "id42"}
    assert len(got) == 3


def test_ids_and_where_combined(db_path, rng):
    db, vecs = _db(db_path, rng)
    subset = [f"id{i}" for i in range(30)]
    res = db.query(vecs[0], top_k=30, ids=subset, where={"tag": 1})
    assert res
    for r in res:
        assert r["tag"] == 1
        assert int(r[K_ID][2:]) < 30


def test_filter_no_matches_returns_empty(db_path, rng):
    db, vecs = _db(db_path, rng)
    assert db.query(vecs[0], top_k=5, where={"tag": 99}) == [[]]
    assert db.query(vecs[:2], top_k=5, where={"tag": 99}) == [[], []]
    assert db.query(vecs[0], top_k=5, ids=["missing"]) == [[]]


def test_filter_after_delete(db_path, rng):
    db, vecs = _db(db_path, rng, n=12)
    db.delete(["id0", "id3", "id6", "id9"])  # all tag 0
    res = db.query(vecs[0], top_k=12, where={"tag": 0})
    assert res == [[]]


def test_filter_mask_matches_naive_loop(db_path, rng):
    db, _ = _db(db_path, rng, n=40)
    active = db._active_mask
    docs = db._docs
    for where in ({"tag": 1}, {"group": {"$in": ["g1", "g3"]}}, {"tag": 0, "group": "g0"}):
        fast = compile_where_mask(where, docs, active, db._tag_index)
        naive = compile_where_mask(where, docs, active, None)
        np.testing.assert_array_equal(fast, naive)


def test_tag_index_tracks_mutations(db_path, rng):
    db, vecs = _db(db_path, rng, n=10)
    # build the column
    db.query(vecs[0], top_k=10, where={"tag": 1})
    # mutate: delete one tag-1 item, retag another
    db.delete(["id1"])
    v = rng.normal(size=16).astype(np.float32)
    db.upsert([{K_ID: "id4", K_VECTOR: v, "tag": 1, "group": "gX"}])
    res = db.query(v, top_k=10, where={"tag": 1})
    got = {r[K_ID] for r in res}
    assert "id1" not in got
    assert "id4" in got


def test_where_with_missing_key(db_path, rng):
    db = PicoVectorDB(embedding_dim=8, storage_file=db_path)
    items, vecs = make_items(rng, 6, 8, extra=lambda i: ({"tag": 1} if i % 2 else {}))
    db.upsert(items)
    res = db.query(vecs[0], top_k=6, where={"tag": 1})
    assert {r[K_ID] for r in res} == {"id1", "id3", "id5"}


def test_unhashable_where_value(db_path, rng):
    db = PicoVectorDB(embedding_dim=8, storage_file=db_path)
    items, vecs = make_items(
        rng, 4, 8, extra=lambda i: {"tags": [i, i + 1]}
    )
    db.upsert(items)
    res = db.query(vecs[0], top_k=4, where={"tags": [1, 2]})
    assert [r[K_ID] for r in res] == ["id1"]


def test_filter_mask_cache_reuse_and_invalidation(db_path, rng):
    """Repeated dict-`where` queries reuse one device-resident mask; any
    mutation invalidates it (epoch bump + device cache clear)."""
    from picovdb_tpu import PicoVectorDB, K_ID, K_VECTOR

    vecs = rng.normal(size=(60, 16)).astype(np.float32)
    db = PicoVectorDB(embedding_dim=16, storage_file=db_path)
    db.upsert(
        [{K_ID: f"f{i}", K_VECTOR: vecs[i], "par": i % 2} for i in range(60)]
    )
    q = vecs[4]
    r1 = db.query(q, top_k=3, where={"par": 0})
    assert len(db._dev._mask_cache) == 1
    key1 = next(iter(db._dev._mask_cache))
    r2 = db.query(q, top_k=3, where={"par": 0})
    assert [h[K_ID] for h in r1] == [h[K_ID] for h in r2]
    assert list(db._dev._mask_cache) == [key1]  # reused, not re-added
    db.query(q, top_k=3, where={"par": 1})
    assert len(db._dev._mask_cache) == 2  # distinct filter, distinct entry
    # ids filters and callables are never cached
    db.query(q, top_k=3, ids=["f1", "f2"])
    db.query(q, top_k=3, where=lambda d: d["par"] == 0)
    assert len(db._dev._mask_cache) == 2
    # mutation: flip one row's tag; the same where must see the new state
    db.upsert([{K_ID: "f4", K_VECTOR: vecs[4], "par": 1}])
    r3 = db.query(q, top_k=1, where={"par": 1})
    assert r3[0][K_ID] == "f4"
    r4 = db.query(q, top_k=3, where={"par": 0})
    assert "f4" not in [h[K_ID] for h in r4]


def test_freeze_where_canonical_forms(db_path):
    from picovdb_tpu.engine import PicoVectorDB

    fw = PicoVectorDB._freeze_where
    assert fw({"a": 1, "b": 2}) == fw({"b": 2, "a": 1})
    assert fw({"a": {"$in": [1, 2]}}) == (("a", "$in", (1, 2)),)
    assert fw(lambda d: True) is None
    assert fw({"a": {"$gt": 3}}) is None  # unknown operator -> uncached
    assert fw({"a": [1, 2]}) is None  # unhashable value -> uncached


def test_freeze_where_unhashable_in_elements(db_path, rng):
    """{'k': {'$in': [[...]]}} — list elements are supported by
    filters.in_mask but unhashable; the frozen key must degrade to None
    (uncached mask) instead of raising at the mask-cache lookup
    (round-2 advisor finding)."""
    from picovdb_tpu.engine import PicoVectorDB

    assert PicoVectorDB._freeze_where({"k": {"$in": [[1, 2]]}}) is None
    db = PicoVectorDB(embedding_dim=8, storage_file=db_path)
    items, vecs = make_items(rng, 6, 8, extra=lambda i: {"k": [i % 2, 0]})
    db.upsert(items)
    res = db.query(vecs[0], top_k=6, where={"k": {"$in": [[1, 0]]}})
    assert {h[K_ID] for h in res} == {"id1", "id3", "id5"}


def test_empty_result_shapes_match_reference(db_path, rng):
    """The reference's empty-result quirk table for 1-D queries (verified
    against the actual checkout): empty store, fully-filtering where, and
    all-missing ids return [[]]; better_than filtering every hit to zero
    returns [] (the candidate set was non-empty)."""
    import numpy as np

    from picovdb_tpu import PicoVectorDB, K_ID, K_VECTOR

    db = PicoVectorDB(embedding_dim=8, storage_file=db_path)
    q = np.ones(8, dtype=np.float32)
    assert db.query(q, top_k=3) == [[]]  # empty store
    db.upsert([{K_ID: "a", K_VECTOR: q.copy(), "g": 1}])
    assert db.query(q, top_k=3, where={"g": 99}) == [[]]
    assert db.query(q, top_k=3, ids=["missing"]) == [[]]
    assert db.query(-q, top_k=3, better_than=0.9) == []


def test_ids_mask_cache_reuse_and_invalidation(db_path, rng):
    """Repeated queries with the SAME ids list object reuse the cached
    slot translation and the device-resident mask; mutation invalidates
    both; a different (even equal-content) list object misses by design."""
    from picovdb_tpu import PicoVectorDB, K_ID, K_VECTOR

    n, dim = 200, 16
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    db = PicoVectorDB(embedding_dim=dim, storage_file=db_path)
    db.upsert([{K_ID: f"f{i}", K_VECTOR: vecs[i]} for i in range(n)])
    allow = [f"f{i}" for i in range(0, n, 2)]  # 100 ids >= cache threshold
    q = vecs[4]
    r1 = db.query(q, top_k=5, ids=allow)
    assert len(db._ids_mask_cache) == 1
    tok1 = db._ids_mask_cache[0]["token"]
    dev_keys = set(db._dev._mask_cache)
    r2 = db.query(q, top_k=5, ids=allow)
    assert [h[K_ID] for h in r1] == [h[K_ID] for h in r2]
    assert db._ids_mask_cache[0]["token"] == tok1  # host entry reused
    assert set(db._dev._mask_cache) == dev_keys  # device mask reused
    assert all(h[K_ID] in set(allow) for h in r2)
    # equal-content but distinct object: identity miss, fresh entry
    db.query(q, top_k=5, ids=list(allow))
    assert len(db._ids_mask_cache) == 2
    # ids + where composes on top of the frozen cached mask
    rw = db.query(q, top_k=5, ids=allow, where=lambda d: True)
    assert [h[K_ID] for h in rw] == [h[K_ID] for h in r1]
    # mutation: delete a cached id; the same list object must see it
    victim = r1[0][K_ID]
    db.delete([victim])
    r3 = db.query(q, top_k=5, ids=allow)
    assert victim not in [h[K_ID] for h in r3]
    # LRU bound holds
    for j in range(6):
        db.query(q, top_k=5, ids=[f"f{i}" for i in range(0, n, 2)])
    assert len(db._ids_mask_cache) <= db._IDS_MASK_CACHE_MAX
