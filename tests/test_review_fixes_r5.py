"""Regression tests for the round-5 whole-package review findings.

Each test pins one fixed defect:
  1. save_atomic removes a stale quantized plane (a fresh f32 save is not
     silently shadowed by an older save(quantized=True) on reload)
  2. wire-rescore eligibility is re-checked under the read lock (a writer
     swapping the corpus between the pre-lock check and the lock cannot
     crash the rescore; the lane falls back to the int16 wire)
  3. _host_rescore sinks guard-band duplicate slots (the same document
     cannot appear twice inside the returned top-k)
  4. the int16 wire encode stays finite on denormal-scale rows (the f32
     scale factor used to overflow to inf below row_max ~1.2e-34)
  5. grow() leaves a consistent device store when a mirror pad fails with
     a non-RESOURCE_EXHAUSTED error (mirror dropped, not half-grown)
  6. the scatter floor and the mutation-path warm gate to the same
     threshold (mid-size stores no longer ship a 1024-row operand per
     tiny epoch that the warm never covered)
"""

import numpy as np
import pytest

from picovdb_tpu import PicoVectorDB, K_ID, K_VECTOR
from picovdb_tpu.utils import encode_query_wire, normalize_batch


def _vecs(rng, n, dim):
    return rng.normal(size=(n, dim)).astype(np.float32)


# 1 ---------------------------------------------------------------------


def test_f32_save_removes_stale_quantized_plane(db_path, rng):
    from picovdb_tpu import persistence

    dim = 16
    v1 = _vecs(rng, 8, dim)
    db = PicoVectorDB(embedding_dim=dim, storage_file=db_path,
                      storage_dtype="int8")
    db.upsert([{K_ID: f"a{i}", K_VECTOR: v1[i]} for i in range(8)])
    db.save(quantized=True)
    assert persistence.load_quantized(db_path) is not None

    # mutate, then save in the reference f32 format: the stale packed
    # plane must go, or the loader would prefer it and serve old vectors
    v2 = _vecs(rng, 8, dim)
    db.upsert([{K_ID: f"a{i}", K_VECTOR: v2[i]} for i in range(8)])
    db.save(quantized=False)
    assert persistence.load_quantized(db_path) is None

    db2 = PicoVectorDB(embedding_dim=dim, storage_file=db_path)
    got = db2.get("a0", include_vector=True)[K_VECTOR]
    want = normalize_batch(v2[:1])[0]
    np.testing.assert_allclose(got, want, atol=1e-5)


# 2 ---------------------------------------------------------------------


def test_wire_rescore_recheck_under_lock(db_path, rng):
    from picovdb_tpu.constants import QUERY_WIRE_MIN_Q

    dim = 16
    n = 64
    db = PicoVectorDB(embedding_dim=dim, storage_file=db_path,
                      query_wire="int8_rescore")
    data = _vecs(rng, n, dim)
    db.upsert([{K_ID: f"r{i}", K_VECTOR: data[i]} for i in range(n)])
    q = _vecs(rng, QUERY_WIRE_MIN_Q, dim)

    # Simulate the race: a writer makes the host rows rescore-ineligible
    # AFTER query_batched judged eligibility but BEFORE it holds the
    # read lock — by flipping the flag from the lock-entry hook itself.
    orig = db._synced_read

    def flip_then_enter():
        db._host_f32_lossy = True
        return orig()

    db._synced_read = flip_then_enter
    try:
        res = db.query_batched(q, top_k=5)
    finally:
        db._synced_read = orig
        db._host_f32_lossy = False
    assert db._last_rescore is None  # fell back, did not crash
    # parity with a plain engine on the same data
    ref = PicoVectorDB(embedding_dim=dim, storage_file=db_path + "_ref")
    ref.upsert([{K_ID: f"r{i}", K_VECTOR: data[i]} for i in range(n)])
    want = ref.query_batched(q, top_k=5)
    assert [[h[K_ID] for h in row] for row in res] == \
        [[h[K_ID] for h in row] for row in want]


# 3 ---------------------------------------------------------------------


def test_host_rescore_sinks_duplicate_slots(db_path, rng):
    dim = 16
    n = 32
    db = PicoVectorDB(embedding_dim=dim, storage_file=db_path)
    data = _vecs(rng, n, dim)
    db.upsert([{K_ID: f"r{i}", K_VECTOR: data[i]} for i in range(n)])
    q = _vecs(rng, 2, dim)
    # device-style candidate slabs with the top slot duplicated in the
    # guard band (the selection tier may return a row twice)
    idxs = np.array([[3, 3, 7, 1, 5], [2, 9, 9, 9, 0]], dtype=np.int64)
    vals = np.full(idxs.shape, 0.5, dtype=np.float32)
    exs, slots = db._host_rescore(vals, idxs, q)
    for r in range(2):
        fin = np.isfinite(exs[r])
        kept = slots[r][fin]
        assert len(set(kept.tolist())) == len(kept)  # no dup inside top-k
        # finite scores sorted descending, dups sunk to the -inf tail
        assert (np.diff(exs[r][fin]) <= 1e-7).all()
        assert fin[: fin.sum()].all()  # -inf strictly at the tail
    # row 0: slot 3 kept once; row 1: slot 9 kept once
    assert (slots[0] == 3).sum() >= 1 and \
        np.isfinite(exs[0][slots[0] == 3]).sum() == 1
    assert np.isfinite(exs[1][slots[1] == 9]).sum() == 1


# 4 ---------------------------------------------------------------------


def test_int16_wire_finite_on_denormal_rows(rng):
    v = rng.normal(size=(4, 32)).astype(np.float32)
    v[1] *= np.float32(1e-38)  # row_max ~3e-38: f32 factor would be inf
    v[3] = 0.0
    w = encode_query_wire(v, "int16")
    assert w.dtype == np.int16
    assert not w[3].any()
    assert np.abs(w).max() <= 32704
    nz = [0, 2]
    np.testing.assert_allclose(
        normalize_batch(w[nz].astype(np.float32)),
        normalize_batch(v[nz]),
        rtol=0, atol=1e-4,
    )
    # the denormal row keeps its true direction (f32 normalize_batch of
    # the raw row underflows to the zero-vector path, so compare in f64)
    w1 = w[1].astype(np.float64)
    v1 = v[1].astype(np.float64)
    cos = (w1 @ v1) / (np.linalg.norm(w1) * np.linalg.norm(v1))
    assert cos > 0.99999


# 5 ---------------------------------------------------------------------


def test_grow_mirror_failure_leaves_consistent_store(db_path, rng):
    import picovdb_tpu.device as device_mod

    dim = 16
    db = PicoVectorDB(embedding_dim=dim, storage_file=db_path)
    data = _vecs(rng, 24, dim)
    db.upsert([{K_ID: f"r{i}", K_VECTOR: data[i]} for i in range(24)])
    db.query(data[0])  # force device sync
    dev = db._dev
    assert dev.vectors is not None

    calls = {"n": 0}
    orig_put = device_mod.jax.device_put

    def failing_put(x, *a, **kw):
        calls["n"] += 1
        if calls["n"] == 2:  # first put (corpus plane) commits, then boom
            raise RuntimeError("simulated transfer failure")
        return orig_put(x, *a, **kw)

    device_mod.jax.device_put = failing_put
    try:
        with pytest.raises(RuntimeError, match="simulated"):
            dev.grow(dev.cap + 4096)
    finally:
        device_mod.jax.device_put = orig_put
    # consistent degraded state: mirror dropped wholesale, not half-grown
    assert dev.vectors is None
    # the engine recovers by re-uploading on the next query
    db._dirty = True
    db._pending_full = True
    hits = db.query(data[5], top_k=1)
    assert hits[0][K_ID] == "r5"


# 6 ---------------------------------------------------------------------


def test_scatter_floor_matches_warm_gate():
    from picovdb_tpu.utils import (
        SCATTER_FLOOR_MIN_ROWS, scatter_bucket, scatter_floor,
    )

    assert SCATTER_FLOOR_MIN_ROWS == 1_000_000
    # mid-size stores: no 4 MB fixed operand per tiny epoch
    assert scatter_floor(100_000) == 8
    assert scatter_bucket(1, 100_000) == 8
    # capacity stores (warmed at build): shared 1024-row executable set
    assert scatter_floor(1_000_000) == 1024
    assert scatter_bucket(1, 1_000_000) == 1024
    assert scatter_bucket(3000, 1_000_000) == 4096


# 7 ---------------------------------------------------------------------


def test_vacuum_invalidates_cached_ids_masks(db_path, rng):
    """vacuum() remaps slots; a cached ids-filter mask from before the
    compaction must not be reused (it marks the OLD slot positions)."""
    dim, n = 16, 96
    db = PicoVectorDB(embedding_dim=dim, storage_file=db_path)
    data = _vecs(rng, n, dim)
    db.upsert([{K_ID: f"r{i}", K_VECTOR: data[i]} for i in range(n)])
    allow = [f"r{i}" for i in range(32, 96)]  # 64 entries -> cached
    q = data[70]
    first = db.query(q, top_k=3, ids=allow)
    assert first[0][K_ID] == "r70"
    assert db._ids_mask_lookup(allow) is not None  # mask really cached
    db.delete([f"r{i}" for i in range(0, 30)])  # slots 0-29 freed
    db.vacuum()  # actives compact to the front: slots remapped
    again = db.query(q, top_k=3, ids=allow)  # SAME list object
    assert again[0][K_ID] == "r70"
    assert all(h[K_ID] in set(allow) for h in again)


# 8 ---------------------------------------------------------------------


def test_rebuild_index_applies_pending_deletes_on_lazy_store(db_path, rng):
    """rebuild_index() on a device-born store must flush pending
    mutations to the mirror before clearing them — it used to drop
    deletes silently (the deleted row kept serving from device)."""
    jnp = pytest.importorskip("jax.numpy")
    dim, n = 16, 64
    db = PicoVectorDB(embedding_dim=dim, storage_file=db_path)
    data = _vecs(rng, n, dim)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    db.ingest_device(jnp.asarray(data), ids=[f"r{i}" for i in range(n)],
                     normalize=False)
    assert db._host_lazy
    db.delete(["r7"])
    db.rebuild_index()
    res = db.query(data[7], top_k=5)
    assert all(h[K_ID] != "r7" for h in res)


# 9 ---------------------------------------------------------------------


def test_columnar_wire_never_ships_raw_int8_without_rescore(db_path, rng):
    """query_columnar has no host-rescore lane for the wire, so
    query_wire='int8_rescore' must encode its uploads as int16 there
    (raw int8 is ~0.98 recall and only safe with the re-rank)."""
    from picovdb_tpu.constants import QUERY_WIRE_MIN_Q

    dim = 16
    db = PicoVectorDB(embedding_dim=dim, storage_file=db_path,
                      query_wire="int8_rescore")
    db.upsert([{K_ID: f"r{i}", K_VECTOR: v}
               for i, v in enumerate(_vecs(rng, 32, dim))])
    q = _vecs(rng, QUERY_WIRE_MIN_Q, dim)
    assert db._wire_encode(q, q.shape[0]).dtype == np.int16  # no lane
    assert db._wire_encode(q, q.shape[0], rescore=True).dtype == np.int8
    res = db.query_columnar(q, top_k=3)
    assert len(res[0]) == q.shape[0]


# 10 --------------------------------------------------------------------


def test_sharded_writer_layout_and_tmp_leftovers(tmp_path, rng):
    """The fixed-per split leaves the remainder BEFORE trailing empties
    on small corpora ([16x6, 4, 0] at n=100 over 8 shards) — the loader
    accepts exactly that shape family — and a crash-leftover
    `<shard>.tmp.npy` must not make validated_shards reject the store."""
    from picovdb_tpu import persistence

    base = str(tmp_path / "s")
    mat = rng.normal(size=(100, 8)).astype(np.float32)
    persistence.save_vectors_sharded(base, mat, 8)
    paths = persistence.validated_shards(base)
    assert len(paths) == 8
    rows = [np.load(p, mmap_mode="r").shape[0] for p in paths]
    assert rows == [16, 16, 16, 16, 16, 16, 4, 0], rows
    back = persistence.load_vectors_sharded(base, 8)
    np.testing.assert_array_equal(back, mat)

    # plant a crash leftover: strict matching must ignore it
    leftover = paths[0][:-4] + ".tmp.npy"
    with open(leftover, "wb") as f:
        f.write(b"garbage")
    assert len(persistence.validated_shards(base)) == 8
    back2 = persistence.load_vectors_sharded(base, 8)
    np.testing.assert_array_equal(back2, mat)


# 11 --------------------------------------------------------------------


def test_rwlock_detects_write_then_read_self_deadlock():
    from picovdb_tpu.locking import RWLock

    lk = RWLock()
    with lk.write_lock():
        with pytest.raises(RuntimeError, match="read lock requested"):
            lk.acquire_read()
    # and the converse still raises
    with lk.read_lock():
        with pytest.raises(RuntimeError, match="write lock requested"):
            lk.acquire_write()
    # lock still usable afterward
    with lk.write_lock():
        pass
    with lk.read_lock():
        pass
