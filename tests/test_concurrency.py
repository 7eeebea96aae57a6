"""RWLock semantics and snapshot-isolated reads under concurrent writers.

Mirrors tests/test_task9_rwlock.py, test_task10_apply_rwlocks.py and
test_task11_snapshot_reads.py of the reference. Real threads, no mocks.
"""

import threading
import time

import numpy as np

from picovdb_tpu import PicoVectorDB, K_ID, K_VECTOR
from picovdb_tpu.locking import RWLock
from conftest import make_items


def test_readers_coexist():
    lock = RWLock()
    inside = []
    barrier = threading.Barrier(3)

    def reader():
        with lock.read_lock():
            barrier.wait(timeout=5)  # all three readers inside at once
            inside.append(1)

    threads = [threading.Thread(target=reader) for _ in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=5)
    assert len(inside) == 3


def test_writer_excludes_readers():
    lock = RWLock()
    order = []
    writer_in = threading.Event()

    def writer():
        with lock.write_lock():
            writer_in.set()
            time.sleep(0.1)
            order.append("w")

    def reader():
        writer_in.wait(timeout=5)
        with lock.read_lock():
            order.append("r")

    tw = threading.Thread(target=writer)
    tr = threading.Thread(target=reader)
    tw.start()
    tr.start()
    tw.join(timeout=5)
    tr.join(timeout=5)
    assert order == ["w", "r"]


def test_writer_excludes_writer():
    lock = RWLock()
    counter = {"v": 0, "max": 0}

    def writer():
        for _ in range(50):
            with lock.write_lock():
                counter["v"] += 1
                counter["max"] = max(counter["max"], counter["v"])
                counter["v"] -= 1

    threads = [threading.Thread(target=writer) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=10)
    assert counter["max"] == 1


def test_queries_stable_under_concurrent_writes(db_path, rng):
    """Concurrent upserts/deletes never corrupt query results: every returned
    hit is internally consistent (id present, score finite, doc is a dict)."""
    dim = 16
    db = PicoVectorDB(embedding_dim=dim, storage_file=db_path)
    items, vecs = make_items(rng, 200, dim)
    db.upsert(items)

    stop = threading.Event()
    errors = []

    def writer():
        i = 0
        w_rng = np.random.default_rng(1)
        while not stop.is_set():
            try:
                v = w_rng.normal(size=dim).astype(np.float32)
                db.upsert([{K_ID: f"w{i % 50}", K_VECTOR: v, "gen": i}])
                if i % 3 == 0:
                    db.delete([f"id{i % 200}"])
                i += 1
            except Exception as e:  # pragma: no cover
                errors.append(e)
                return

    def reader():
        while not stop.is_set():
            try:
                res = db.query(vecs[3], top_k=5)
                for r in res:
                    assert isinstance(r[K_ID], str)
                    assert np.isfinite(r["_metrics_"])
            except Exception as e:  # pragma: no cover
                errors.append(e)
                return

    tw = threading.Thread(target=writer)
    readers = [threading.Thread(target=reader) for _ in range(2)]
    tw.start()
    for t in readers:
        t.start()
    time.sleep(1.5)
    stop.set()
    tw.join(timeout=10)
    for t in readers:
        t.join(timeout=10)
    assert not errors, errors
    # store still coherent afterwards
    res = db.query(vecs[4], top_k=3)
    assert res


def test_write_under_read_lock_raises():
    """Self-deadlock detection (new: SURVEY.md §5 race-detection stand-in)."""
    import pytest

    lock = RWLock()
    with lock.read_lock():
        with pytest.raises(RuntimeError, match="deadlock"):
            lock.acquire_write()
    # after releasing the read lock, writing works
    with lock.write_lock():
        pass


def test_reentrant_read_lock_allowed():
    lock = RWLock()
    with lock.read_lock():
        with lock.read_lock():
            pass
    with lock.write_lock():
        pass


def test_writer_priority_gates_new_readers():
    """With writer_priority=True a waiting writer blocks NEW readers (they
    queue behind it) while in-flight readers drain; without it the writer
    has no such gate (reference parity, picovdb/pico_vdb.py:1019-1063)."""
    lock = RWLock(writer_priority=True)
    order = []
    reader_started = threading.Event()
    release_reader = threading.Event()
    writer_waiting = threading.Event()

    def first_reader():
        with lock.read_lock():
            reader_started.set()
            release_reader.wait(timeout=10)
        order.append("reader1-done")

    def writer():
        writer_waiting.set()
        with lock.write_lock():
            order.append("writer")

    def late_reader():
        with lock.read_lock():
            order.append("reader2")

    t1 = threading.Thread(target=first_reader)
    t1.start()
    assert reader_started.wait(timeout=10)
    tw = threading.Thread(target=writer)
    tw.start()
    assert writer_waiting.wait(timeout=10)
    time.sleep(0.05)  # let the writer reach its wait loop
    t2 = threading.Thread(target=late_reader)
    t2.start()
    time.sleep(0.1)
    # the late reader must be gated while the writer waits
    assert "reader2" not in order
    release_reader.set()
    for t in (t1, tw, t2):
        t.join(timeout=10)
    assert order.index("writer") < order.index("reader2")


def test_writer_priority_reentrant_read_not_gated():
    """A thread already holding a read lock must be able to re-enter it even
    while a writer waits — gating the nested acquire would deadlock both."""
    lock = RWLock(writer_priority=True)
    done = threading.Event()
    outer_read = threading.Event()
    writer_started = threading.Event()

    def holder():
        with lock.read_lock():
            outer_read.set()
            writer_started.wait(timeout=10)
            time.sleep(0.05)  # writer is in its wait loop now
            with lock.read_lock():  # must NOT block behind the writer
                done.set()

    def writer():
        outer_read.wait(timeout=10)
        writer_started.set()
        with lock.write_lock():
            pass

    th = threading.Thread(target=holder)
    tw = threading.Thread(target=writer)
    th.start()
    tw.start()
    th.join(timeout=10)
    tw.join(timeout=10)
    assert done.is_set()


def test_writer_priority_engine_knob(db_path, rng, monkeypatch):
    """Engine kwarg -> env -> default precedence for writer_priority."""
    dim = 8
    db = PicoVectorDB(embedding_dim=dim, storage_file=db_path)
    assert db._rwlock._writer_priority is False
    db2 = PicoVectorDB(
        embedding_dim=dim, storage_file=db_path + "_wp", writer_priority=True
    )
    assert db2._rwlock._writer_priority is True
    monkeypatch.setenv("PICOVDB_WRITER_PRIORITY", "1")
    db3 = PicoVectorDB(embedding_dim=dim, storage_file=db_path + "_env")
    assert db3._rwlock._writer_priority is True
    db4 = PicoVectorDB(
        embedding_dim=dim, storage_file=db_path + "_kw", writer_priority=False
    )
    assert db4._rwlock._writer_priority is False
    # end-to-end sanity: a priority store still serves correct results
    vecs = rng.normal(size=(32, dim)).astype(np.float32)
    db2.upsert_columnar(vecs.copy(), ids=[f"p{i}" for i in range(32)])
    hits = db2.query(vecs[3], top_k=1)
    assert hits[0][K_ID] == "p3"


def test_filtered_queries_under_concurrent_writes(db_path, rng):
    """Mask-cache correctness under contention: readers issue the same
    dict-`where` query (device mask cache hits) while a writer mutates
    tags; every result must satisfy its filter against a consistent
    snapshot."""
    import threading

    from picovdb_tpu import PicoVectorDB, K_ID, K_VECTOR

    dim, n = 16, 300
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    db = PicoVectorDB(embedding_dim=dim, storage_file=db_path)
    db.upsert(
        [{K_ID: f"c{i}", K_VECTOR: vecs[i], "par": i % 2} for i in range(n)]
    )
    errors = []
    stop = threading.Event()

    def reader():
        q = rng.normal(size=dim).astype(np.float32)
        while not stop.is_set():
            for want in (0, 1):
                hits = db.query(q, top_k=5, where={"par": want})
                if any(h["par"] != want for h in hits):
                    errors.append(("filter violated", want, hits))
                    return

    def writer():
        j = 0
        while not stop.is_set():
            i = j % n
            db.upsert(
                [{K_ID: f"c{i}", K_VECTOR: vecs[i], "par": (i + j) % 2}]
            )
            j += 1

    threads = [threading.Thread(target=reader) for _ in range(3)] + [
        threading.Thread(target=writer)
    ]
    for t in threads:
        t.start()
    time.sleep(2.0)
    stop.set()
    for t in threads:
        t.join(timeout=30)
    assert not errors, errors[:1]


def test_segmax_retry_uses_dispatch_snapshot(db_path, rng, monkeypatch):
    """A writer that full-reuploads the mirror between a segmax dispatch and
    its underfill retry must not leak into the retry: results must match the
    corpus captured at dispatch time (round-2 review item 6).

    The mutation is injected at the exact race window by wrapping
    engine._start_host_copies (runs after the read lock is released, before
    assembly); the underfill is forced by poisoning one returned score.
    """
    import picovdb_tpu.engine as eng

    dim, n = 16, 512
    db = PicoVectorDB(embedding_dim=dim, storage_file=db_path,
                      scan_mode="mixed")
    db._dev.SEGMAX_MIN_CAP = 256  # segmax normally needs a 32k corpus
    old_vecs = rng.normal(size=(n, dim)).astype(np.float32)
    ids = [f"s{i}" for i in range(n)]
    db.upsert_columnar(old_vecs.copy(), ids=ids)
    q = rng.normal(size=(4, dim)).astype(np.float32)

    # oracle over the OLD corpus (normalized cosine)
    nv = old_vecs / np.linalg.norm(old_vecs, axis=1, keepdims=True)
    nq = q / np.linalg.norm(q, axis=1, keepdims=True)
    oracle = np.argsort(-(nq @ nv.T), axis=1)[:, :4]

    dispatched = {}
    orig_async = db._dev.query_async

    def poison_async(qnorm, k, filter_mask=None, force_exact=False,
                     mask_key=None):
        vals, idxs, num_q, ke = orig_async(
            qnorm, k, filter_mask, force_exact=force_exact, mask_key=mask_key
        )
        if not force_exact and db._dev.last_strategy == "segmax_mixed":
            vals = np.asarray(vals).copy()
            vals[0, -1] = -np.inf  # fake an underfill -> retry path
            dispatched["poisoned"] = True
        return vals, idxs, num_q, ke

    monkeypatch.setattr(db._dev, "query_async", poison_async)

    orig_copies = eng._start_host_copies

    def mutate_then_copy(pending):
        # the racing writer: swap every vector and the device mirror handle
        db.upsert_columnar(
            rng.normal(size=(n, dim)).astype(np.float32), ids=ids
        )
        db.rebuild_index()  # full re-upload -> self._dev.vectors swaps
        dispatched["mutated"] = True
        orig_copies(pending)

    monkeypatch.setattr(eng, "_start_host_copies", mutate_then_copy)

    res = db.query_batched(q, top_k=4)
    assert dispatched == {"poisoned": True, "mutated": True}
    got = [[h[K_ID] for h in r] for r in res]
    want = [[f"s{j}" for j in row] for row in oracle]
    assert got == want


def test_writer_latency_bounded_under_reader_load(db_path, rng):
    """Writer-starvation stress (round-2 review weak item 7): this RWLock
    reproduces the reference's no-writer-priority semantics
    (picovdb/pico_vdb.py:1019-1063), and writers here additionally hold the
    lock through device sync. Under continuous reader pressure a writer
    must still get through in bounded time; the measured wait is attached
    to the test report via print (visible with -s / on failure)."""
    import threading
    import time

    dim, n = 16, 1024
    db = PicoVectorDB(embedding_dim=dim, storage_file=db_path)
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    db.upsert_columnar(vecs.copy(), ids=[f"w{i}" for i in range(n)])
    db.query(vecs[0], top_k=4)  # warm compile outside the timed window

    stop = threading.Event()
    errors = []

    def reader():
        i = 0
        while not stop.is_set():
            try:
                db.query(vecs[i % n], top_k=4)
            except Exception as e:  # pragma: no cover
                errors.append(e)
                return
            i += 1
            # serving-shaped load: back-to-back-with-gaps, not a spin that
            # permanently overlaps read locks — with no writer priority
            # (reference parity, pico_vdb.py:1019-1063) a zero-gap spin on
            # a single core can starve the writer unboundedly, which is
            # the documented semantics, not a regression
            time.sleep(0.002)

    readers = [threading.Thread(target=reader) for _ in range(4)]
    for t in readers:
        t.start()
    time.sleep(0.3)  # readers at steady state
    waits = []
    try:
        for j in range(5):
            t0 = time.perf_counter()
            db.upsert([{K_ID: f"new{j}", K_VECTOR: vecs[j]}])
            waits.append(time.perf_counter() - t0)
    finally:
        stop.set()
        for t in readers:
            t.join(timeout=30)
    assert not errors, errors[:1]
    print(f"writer waits under 4-reader load: "
          f"max {max(waits)*1000:.1f} ms, all {[f'{w*1000:.0f}' for w in waits]}")
    # generous bound: starvation would show up as tens of seconds
    assert max(waits) < 10.0, waits


def test_mesh_int4_queries_stable_under_concurrent_writes(db_path, rng):
    """Sharded lossy-storage store under concurrent mutation: snapshot
    isolation must hold across shard_map dispatches AND the host-f64
    rescore's candidate gather (which reads the host matrix inside the
    read lock while writers scatter packed rows + scales on device).
    Every hit returned mid-churn must be internally consistent."""
    from picovdb_tpu.parallel import make_mesh

    dim = 16
    db = PicoVectorDB(embedding_dim=dim, storage_file=db_path,
                      mesh=make_mesh(), storage_dtype="int4")
    items, vecs = make_items(rng, 200, dim)
    db.upsert(items)

    stop = threading.Event()
    errors = []

    def writer():
        i = 0
        w_rng = np.random.default_rng(2)
        while not stop.is_set():
            try:
                v = w_rng.normal(size=dim).astype(np.float32)
                db.upsert([{K_ID: f"w{i % 50}", K_VECTOR: v, "gen": i}])
                if i % 3 == 0:
                    db.delete([f"id{i % 200}"])
                i += 1
            except Exception as e:  # pragma: no cover
                errors.append(e)
                return

    def reader():
        while not stop.is_set():
            try:
                res = db.query(vecs[3], top_k=5)
                for r in res:
                    assert isinstance(r[K_ID], str)
                    assert np.isfinite(r["_metrics_"])
            except Exception as e:  # pragma: no cover
                errors.append(e)
                return

    tw = threading.Thread(target=writer)
    readers = [threading.Thread(target=reader) for _ in range(2)]
    tw.start()
    for t in readers:
        t.start()
    time.sleep(1.5)
    stop.set()
    tw.join(timeout=20)
    for t in readers:
        t.join(timeout=20)
    assert not errors, errors
    res = db.query(vecs[4], top_k=3)
    assert res and db._dev.last_strategy.startswith("sharded_scan_i4stor")


def test_ivf_batched_lane_under_concurrent_writes(db_path, rng):
    """query_batched with an index='ivf' store under concurrent mutation:
    the lane dispatches through the tier's search_async while writers
    force full ANN rebuilds on every mutation (the mesh-style rebuild
    policy also races the single-device tier's incremental update). The
    lane captures docs_ref and device handles inside the read lock, so
    every hit returned mid-churn must be internally consistent (a real
    id whose finite score came from SOME consistent snapshot)."""
    import jax.experimental.pallas.tpu as pltpu

    dim = 24
    with pltpu.force_tpu_interpret_mode():
        db = PicoVectorDB(embedding_dim=dim, storage_file=db_path,
                          index="ivf", ivf_nlist=8)
        items, vecs = make_items(rng, 300, dim)
        db.upsert(items)
        db.query(vecs[0], top_k=1)  # build the tier

        stop = threading.Event()
        errors = []

        def writer():
            i = 0
            while not stop.is_set():
                try:
                    if i % 3 == 0:
                        db.upsert(
                            [{K_ID: f"id{i % 300}",
                              K_VECTOR: rng.normal(size=dim).astype(
                                  np.float32)}]
                        )
                    else:
                        db.delete([f"id{i % 300}"])
                    i += 1
                except Exception as e:  # pragma: no cover
                    errors.append(e)
                    return

        def reader():
            while not stop.is_set():
                try:
                    res = db.query_batched(
                        np.stack([vecs[3], vecs[7]]), top_k=5,
                        ef_search=1000,
                    )
                    for row in res:
                        for r in row:
                            assert isinstance(r[K_ID], str)
                            assert np.isfinite(r["_metrics_"])
                except Exception as e:  # pragma: no cover
                    errors.append(e)
                    return

        tw = threading.Thread(target=writer)
        readers = [threading.Thread(target=reader) for _ in range(2)]
        tw.start()
        for t in readers:
            t.start()
        time.sleep(1.5)
        stop.set()
        tw.join(timeout=20)
        for t in readers:
            t.join(timeout=20)
        assert not errors, errors
        res = db.query_batched(np.stack([vecs[4]]), top_k=3,
                               ef_search=1000)
        assert res and res[0]
        assert db._last_topk_strategy.startswith("ivf")
