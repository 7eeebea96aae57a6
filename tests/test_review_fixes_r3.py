"""Regression tests for the round-3 whole-package review findings.

Each test pins one fixed defect:
  1. capacity-exceeded upserts are all-or-nothing (no partial batch state)
  2. re-sharding a save removes the previous generation's shard files, and
     a mixed-generation shard set refuses to load
  3. DeviceIndex.last_strategy is per-thread (the underfill-retry decision
     reads the dispatching thread's own strategy)
  4. query_columnar's rescore lane forwards ef_search/hnsw_ef_search
  5. PICOVDB_IVF_I8ONLY only honors explicit opt-in/opt-out values
  6. get_all(include_deleted=True, include_vector=True) does not
     materialize the lazy id->slot map
  7. _start_host_copies skips host-resident entries instead of aborting
"""

import glob
import os
import threading

import numpy as np
import pytest

from picovdb_tpu import PicoVectorDB, K_ID, K_VECTOR
from conftest import make_items


def _vecs(rng, n, dim):
    return rng.normal(size=(n, dim)).astype(np.float32)


# ---- 1. all-or-nothing capacity ------------------------------------------


def test_capacity_exceeded_upsert_leaves_store_untouched(db_path, rng):
    dim = 16
    db = PicoVectorDB(embedding_dim=dim, storage_file=db_path, capacity=2)
    vecs = _vecs(rng, 3, dim)
    with pytest.raises(ValueError, match="capacity exceeded"):
        db.upsert([{K_ID: f"n{i}", K_VECTOR: vecs[i]} for i in range(3)])
    # nothing from the failed batch is visible anywhere
    assert db.count() == 0
    assert len(db._free) == 2
    assert db.get("n0") is None
    assert db.query(vecs[0], top_k=1) == [[]]  # empty-store shape contract
    # the same store still accepts a fitting batch
    rep = db.upsert([{K_ID: f"n{i}", K_VECTOR: vecs[i]} for i in range(2)])
    assert rep["insert"] == ["n0", "n1"]
    assert db.count() == 2
    assert db.query(vecs[1], top_k=1)[0][K_ID] == "n1"


def test_capacity_exceeded_upsert_with_updates_counts_only_fresh(db_path, rng):
    """Updates of existing ids consume no slots; only distinct new ids do."""
    dim = 16
    db = PicoVectorDB(embedding_dim=dim, storage_file=db_path, capacity=3)
    vecs = _vecs(rng, 6, dim)
    db.upsert([{K_ID: "a", K_VECTOR: vecs[0]}, {K_ID: "b", K_VECTOR: vecs[1]}])
    # 2 updates + 1 fresh + a duplicated fresh id -> needs exactly 1 slot
    rep = db.upsert([
        {K_ID: "a", K_VECTOR: vecs[2]},
        {K_ID: "b", K_VECTOR: vecs[3]},
        {K_ID: "c", K_VECTOR: vecs[4]},
        {K_ID: "c", K_VECTOR: vecs[5]},  # dup within batch: last wins
    ])
    # the second "c" lands on the slot the first one claimed -> reported
    # as an update (reference in-batch duplicate semantics)
    assert sorted(rep["update"]) == ["a", "b", "c"]
    assert rep["insert"] == ["c"]
    assert db.count() == 3
    # one more fresh id must fail atomically
    with pytest.raises(ValueError, match="capacity exceeded"):
        db.upsert([{K_ID: "d", K_VECTOR: vecs[0]}])
    assert db.count() == 3
    assert db.get("d") is None


def test_capacity_exceeded_columnar_leaves_store_untouched(db_path, rng):
    dim = 16
    db = PicoVectorDB(embedding_dim=dim, storage_file=db_path, capacity=2)
    vecs = _vecs(rng, 2, dim)
    db.upsert_columnar(vecs, ids=["a", "b"])
    more = _vecs(rng, 3, dim)
    with pytest.raises(ValueError, match="capacity exceeded"):
        db.upsert_columnar(more, ids=["a", "c", "d"])  # 1 update + 2 fresh
    assert db.count() == 2
    assert db.get("c") is None and db.get("d") is None
    # the would-be update in the failed batch must NOT have applied either
    got = db.get("a", include_vector=True)
    na = vecs[0] / np.linalg.norm(vecs[0])
    assert np.allclose(got[K_VECTOR], na, atol=1e-6)
    # updates alone still work at full capacity
    rep = db.upsert_columnar(more[:1], ids=["a"])
    assert rep["update"] == ["a"]


# ---- 2. re-sharding cleanup + mixed-generation guard ---------------------


def test_reshard_save_removes_previous_generation(db_path, rng):
    db = PicoVectorDB(embedding_dim=8, storage_file=db_path)
    items, vecs = make_items(rng, 25, 8)
    db.upsert(items)
    db.save(shards=4)
    assert len(glob.glob(db_path + ".vecs.shard*.npy")) == 4
    db.save(shards=2)
    files = sorted(glob.glob(db_path + ".vecs.shard*.npy"))
    assert len(files) == 2
    assert all("of002" in f for f in files)
    db2 = PicoVectorDB(embedding_dim=8, storage_file=db_path)
    assert db2.count() == 25
    assert db2.query(vecs[9], top_k=1)[0][K_ID] == "id9"


def test_mixed_shard_generations_refuse_to_load(db_path, rng):
    from picovdb_tpu.persistence import shard_path

    db = PicoVectorDB(embedding_dim=8, storage_file=db_path)
    items, _ = make_items(rng, 10, 8)
    db.upsert(items)
    db.save(shards=2)
    # plant a stale shard from a different generation (pre-fix stores)
    stale = shard_path(db_path, 0, 4)
    np.save(stale[:-4], np.zeros((3, 8), np.float32))
    with pytest.raises(ValueError, match="inconsistent shard set"):
        PicoVectorDB(embedding_dim=8, storage_file=db_path)
    os.remove(stale)
    db2 = PicoVectorDB(embedding_dim=8, storage_file=db_path)
    assert db2.count() == 10


# ---- 3. thread-local dispatch strategy -----------------------------------


def test_last_strategy_is_thread_local(db_path, rng):
    db = PicoVectorDB(embedding_dim=16, storage_file=db_path)
    db.upsert_columnar(_vecs(rng, 32, 16), ids=[f"i{j}" for j in range(32)])
    db.query(_vecs(rng, 1, 16)[0], top_k=2)  # sets this thread's strategy
    mine = db._dev.last_strategy
    assert mine is not None

    seen = {}

    def other():
        # another thread's dispatch must not clobber this thread's view
        db._dev.last_strategy = "other_thread_strategy"
        seen["other"] = db._dev.last_strategy

    t = threading.Thread(target=other)
    t.start()
    t.join()
    assert seen["other"] == "other_thread_strategy"
    assert db._dev.last_strategy == mine
    # a thread that never dispatched reads the global fallback
    seen2 = {}
    t2 = threading.Thread(
        target=lambda: seen2.update(v=db._dev.last_strategy)
    )
    t2.start()
    t2.join()
    assert seen2["v"] == "other_thread_strategy"


# ---- 4. rescore lane forwards ef ----------------------------------------


def test_columnar_rescore_lane_forwards_ef(db_path, rng):
    db = PicoVectorDB(embedding_dim=32, storage_file=db_path,
                      storage_dtype="int8")
    db.upsert_columnar(_vecs(rng, 64, 32), ids=[f"r{j}" for j in range(64)])
    captured = {}
    orig = db._rescored_dispatch

    def spy(vecs, k_eff, n_cand, filter_mask, ef_search=None,
            hnsw_ef_search=None, mask_key=None):
        captured["ef"] = ef_search
        captured["hnsw_ef"] = hnsw_ef_search
        return orig(vecs, k_eff, n_cand, filter_mask, ef_search,
                    hnsw_ef_search, mask_key=mask_key)

    db._rescored_dispatch = spy
    q = _vecs(rng, 4, 32)
    ids_col, _ = db.query_columnar(q, top_k=3, ef_search=77,
                                   hnsw_ef_search=88)
    assert captured["ef"] == 77 and captured["hnsw_ef"] == 88
    assert db.last_query_debug()["rescore"] == "host"
    assert ids_col.shape == (4, 3)


# ---- 5. PICOVDB_IVF_I8ONLY env hygiene -----------------------------------


@pytest.mark.parametrize("val", ["off", "no", "typo", "OFF"])
def test_ivf_i8only_env_rejects_non_truthy(db_path, rng, monkeypatch, val):
    db = PicoVectorDB(embedding_dim=256, storage_file=db_path)
    db.upsert_columnar(_vecs(rng, 32, 256), ids=[f"i{j}" for j in range(32)])
    monkeypatch.setenv("PICOVDB_IVF_I8ONLY", val)
    if val in ("off", "OFF", "no"):
        assert db._ivf_i8_only() is False
    else:
        # typos fall to the auto heuristic; a tiny store is far under the
        # HBM budget, so auto must also say False (never force-ON)
        assert db._ivf_i8_only() is False
    monkeypatch.setenv("PICOVDB_IVF_I8ONLY", "yes")
    assert db._ivf_i8_only() is True  # dim>=256: tier available


# ---- 6. get_all laziness --------------------------------------------------


def test_get_all_deleted_vectors_stays_lazy(db_path, rng):
    db = PicoVectorDB(embedding_dim=16, storage_file=db_path)
    ids = [f"g{j}" for j in range(20)]
    db.upsert_columnar(_vecs(rng, 20, 16), ids=ids)
    assert db._id2idx_store is None
    recs = db.get_all(include_vector=True, include_deleted=True)
    assert len(recs) == 20
    assert db._id2idx_store is None  # enumeration index, no dict build
    # vectors are the real rows, paired with the right ids
    got = {r[K_ID]: r[K_VECTOR] for r in recs}
    want = db.get("g7", include_vector=True)[K_VECTOR]  # materializes map
    assert np.allclose(got["g7"], want)


# ---- 7. _start_host_copies skips host entries ----------------------------


def test_start_host_copies_skips_numpy_entries():
    from picovdb_tpu.engine import _start_host_copies

    class Rec:
        def __init__(self):
            self.called = 0

        def copy_to_host_async(self):
            self.called += 1

    a, b = Rec(), Rec()
    host_entry = (np.zeros((2, 2)), np.zeros((2, 2), np.int32), 2, 2)
    dev_entry = (a, b, 2, 2)
    _start_host_copies([host_entry, dev_entry])
    assert a.called == 1 and b.called == 1
