"""Host-f32 exact rescore for lossy storage dtypes (bfloat16 / int8).

The reference stores float32 and ranks exactly (picovdb/pico_vdb.py:683-713);
this framework's quantized-storage capacity tiers (int8 = 4x f32 capacity,
bf16 = 2x) rank from quantized scores, which floors recall@10 below 1.0 on
near-tie corpora. The rescore tier restores exact f32 ranking: the device
selects top-(k + guard) candidates, the host re-ranks them against the
authoritative float32 matrix (RAM or memmap). Measured: guard 128 recovers
recall@10 = 1.0000 vs the f64 oracle on every corpus tried, including
near-duplicate clusters at dim 64 where the device-only path drops to ~0.2.
"""

import numpy as np
import pytest

from picovdb_tpu import PicoVectorDB, K_ID, K_METRICS, K_VECTOR
from picovdb_tpu.utils import normalize_batch

DIM = 64


def _neartie_corpus(rng, n=4096, dim=DIM, spread=0.02, n_centers=80):
    # ~n/n_centers near-duplicates per cluster; keep that below the
    # rescore guard (128) or no candidate set of that width can contain
    # the true top-k on queries that land mid-cluster.
    """Clustered corpus whose neighbor gaps sit below int8 score noise."""
    centers = rng.normal(size=(n_centers, dim)).astype(np.float32)
    data = centers[rng.integers(0, n_centers, n)] + spread * rng.normal(
        size=(n, dim)
    ).astype(np.float32)
    return normalize_batch(data.astype(np.float32))


def _recall(db, data, q, k=10, **kw):
    """Tie-aware recall@k vs the f64 oracle: a returned id counts if its
    true score ties or beats the oracle's k-th score (near-duplicate
    corpora produce exact f64 ties at the boundary — interchangeable).

    The oracle scores the STORED rows — upsert re-normalizes each vector
    (reference semantics), which moves f32 values by ~1e-8, the same
    order as this corpus's true gaps."""
    got = db.query(q, top_k=k, **kw)
    if q.ndim == 1:
        got = [got]
    stored = normalize_batch(data.copy())
    qn = normalize_batch(np.atleast_2d(q).astype(np.float32))
    s = qn.astype(np.float64) @ stored.astype(np.float64).T
    kth = -np.sort(-s, axis=1)[:, k - 1]
    hits = 0
    for i, res in enumerate(got):
        hits += sum(s[i, int(r[K_ID])] >= kth[i] for r in res)
    return hits / (len(got) * k)


def _mkdb(db_path, data, storage_dtype="int8", **kw):
    db = PicoVectorDB(
        embedding_dim=data.shape[1],
        storage_file=db_path,
        storage_dtype=storage_dtype,
        index="exact",
        **kw,
    )
    db.upsert([{K_ID: str(i), K_VECTOR: data[i]} for i in range(len(data))])
    return db


def test_int8_storage_host_rescore_recovers_recall(db_path, rng):
    data = _neartie_corpus(rng)
    q = data[rng.integers(0, len(data), 32)] + 0.005 * rng.normal(
        size=(32, DIM)
    ).astype(np.float32)

    dev = _mkdb(db_path + "_dev", data, rescore="device")
    r_dev = _recall(dev, data, q)
    assert dev.last_query_debug()["rescore"] is None

    host = _mkdb(db_path + "_host", data, rescore="host")
    r_host = _recall(host, data, q)
    assert host.last_query_debug()["rescore"] == "host"

    # the adversarial corpus defeats quantized ranking but not the
    # guard-band + exact-f32 re-rank
    assert r_dev < 0.9
    assert r_host == 1.0


def test_bf16_storage_host_rescore(db_path, rng):
    data = _neartie_corpus(rng, spread=0.003)
    q = data[rng.integers(0, len(data), 16)]
    host = _mkdb(db_path, data, storage_dtype="bfloat16", rescore="host")
    assert _recall(host, data, q) == 1.0
    assert host.last_query_debug()["rescore"] == "host"


def test_auto_mode_gates_on_storage_and_batch_size(db_path, rng):
    data = _neartie_corpus(rng, n=512)
    q = data[:4]

    # f32 storage: device ranking is already exact — rescore stands down
    f32 = _mkdb(db_path + "_f32", data, storage_dtype="float32")
    f32.query(q, top_k=5)
    assert f32.last_query_debug()["rescore"] is None

    # int8 storage, small batch: auto applies
    i8 = _mkdb(db_path + "_i8", data)
    i8.query(q, top_k=5)
    assert i8.last_query_debug()["rescore"] == "host"

    # above the batch cutoff: auto declines (throughput path)
    big_q = np.repeat(q, 64, axis=0)  # 256 > RESCORE_MAX_Q
    i8.query(big_q, top_k=5)
    assert i8.last_query_debug()["rescore"] is None


def test_rescore_scores_are_exact_f32(db_path, rng):
    data = _neartie_corpus(rng)
    q = data[7]
    db = _mkdb(db_path, data, rescore="host")
    hits = db.query(q, top_k=5)
    qn = normalize_batch(q[None].astype(np.float32))[0]
    for h in hits:
        exact = float(qn @ data[int(h[K_ID])])
        assert abs(h[K_METRICS] - exact) < 1e-5


def test_rescore_with_filters_and_better_than(db_path, rng):
    data = _neartie_corpus(rng, n=1024)
    db = PicoVectorDB(
        embedding_dim=DIM, storage_file=db_path, storage_dtype="int8",
        index="exact", rescore="host",
    )
    db.upsert(
        [{K_ID: str(i), K_VECTOR: data[i], "g": i % 4} for i in range(len(data))]
    )
    q = data[11]
    hits = db.query(q, top_k=8, where={"g": 3})
    assert hits and all(h["g"] == 3 for h in hits)
    # oracle over the filtered candidate set (stored = re-normalized rows)
    stored = normalize_batch(data.copy())
    qn = normalize_batch(q[None].astype(np.float32))
    cand = np.arange(len(data))[np.arange(len(data)) % 4 == 3]
    s = (qn.astype(np.float64) @ stored[cand].astype(np.float64).T)[0]
    want = [str(cand[j]) for j in np.argsort(-s)[:8]]
    assert [h[K_ID] for h in hits] == want

    floor = hits[3][K_METRICS]
    capped = db.query(q, top_k=8, where={"g": 3}, better_than=float(floor))
    assert [h[K_ID] for h in capped] == want[:4]


def test_rescore_query_lanes_agree(db_path, rng):
    data = _neartie_corpus(rng)
    q = data[rng.integers(0, len(data), 24)]
    db = _mkdb(db_path, data, rescore="host")

    via_query = db.query(q, top_k=6)
    via_batched = db.query_batched(q, top_k=6)
    assert [[h[K_ID] for h in r] for r in via_query] == [
        [h[K_ID] for h in r] for r in via_batched
    ]

    ids_col, scores_col = db.query_columnar(q, top_k=6)
    for i, res in enumerate(via_query):
        assert [h[K_ID] for h in res] == list(ids_col[i][: len(res)])
        np.testing.assert_allclose(
            [h[K_METRICS] for h in res], scores_col[i][: len(res)], rtol=1e-6
        )


def test_device_born_store_stands_down(db_path, rng):
    """A lossy-storage store whose host copy came from the device mirror
    cannot be improved by host rescore — the tier must not pretend."""
    import jax.numpy as jnp

    data = _neartie_corpus(rng, n=512)
    db = PicoVectorDB(
        embedding_dim=DIM, storage_file=db_path, storage_dtype="int8",
        index="exact", rescore="auto",
    )
    db.ingest_device(jnp.asarray(data), ids=[str(i) for i in range(len(data))])
    db.query(data[3], top_k=5)
    assert db.last_query_debug()["rescore"] is None
    # force-materialize the host copy from the lossy mirror: still down
    db.get(str(3), include_vector=True)
    db.query(data[3], top_k=5)
    assert db.last_query_debug()["rescore"] is None


def test_device_born_host_shadow_serves_exact_rescore(db_path, rng):
    """ingest_device(host_shadow=True) keeps the authentic pre-cast f32
    rows, so the host rescore tier serves exact ranking for device-born
    lossy stores (VERDICT r3 item 3) instead of standing down."""
    import jax.numpy as jnp

    data = _neartie_corpus(rng, n=2048)
    q = data[rng.integers(0, len(data), 8)] + 0.005 * rng.normal(
        size=(8, DIM)
    ).astype(np.float32)
    ids = [str(i) for i in range(len(data))]

    down = PicoVectorDB(
        embedding_dim=DIM, storage_file=db_path + "_down",
        storage_dtype="int8", index="exact", rescore="auto",
    )
    down.ingest_device(jnp.asarray(data.copy()), ids=ids)
    r_down = _recall(down, data, q)
    assert down.last_query_debug()["rescore"] is None

    db = PicoVectorDB(
        embedding_dim=DIM, storage_file=db_path, storage_dtype="int8",
        index="exact", rescore="auto",
    )
    db.ingest_device(jnp.asarray(data.copy()), ids=ids, host_shadow=True)
    assert not db._host_lazy and not db._host_f32_lossy
    assert _recall(db, data, q) == 1.0
    assert db.last_query_debug()["rescore"] == "host"
    assert _recall(db, data, q) >= r_down  # and strictly better in practice


def test_device_born_host_shadow_int4(db_path, rng):
    """The int4 capacity tier — the worst device-ranked recall — recovers
    recall@10 = 1.0 through the shadow-backed host rescore."""
    import jax.numpy as jnp

    data = _neartie_corpus(rng, n=1024)
    q = data[rng.integers(0, len(data), 6)] + 0.005 * rng.normal(
        size=(6, DIM)
    ).astype(np.float32)
    db = PicoVectorDB(
        embedding_dim=DIM, storage_file=db_path, storage_dtype="int4",
        index="exact", rescore="host",
    )
    db.ingest_device(
        jnp.asarray(data.copy()), ids=[str(i) for i in range(len(data))],
        host_shadow=True,
    )
    assert _recall(db, data, q) == 1.0
    assert db.last_query_debug()["rescore"] == "host"


def test_wide_topk_on_int8_storage_does_not_crash(db_path, rng):
    """k beyond the Pallas VMEM block routes to the dense XLA fallback
    (ops/pallas_scan.py fused_topk_i8) instead of asserting."""
    data = normalize_batch(
        rng.normal(size=(2048, DIM)).astype(np.float32)
    )
    db = _mkdb(db_path, data, rescore="device")
    hits = db.query(data[5], top_k=600)
    assert len(hits) == 600
    assert hits[0][K_ID] == "5"


def test_guard_saturation_escalates(db_path, rng):
    """Clusters wider than the guard band (256 near-duplicates vs guard
    128) trigger the one-shot 4x-wider re-dispatch and still serve exact
    top-k (the TPU-measured failure geometry, scaled down)."""
    data = _neartie_corpus(rng, n=4096, n_centers=16)  # ~256 mates/cluster
    q = data[rng.integers(0, len(data), 8)] + 0.005 * rng.normal(
        size=(8, DIM)
    ).astype(np.float32)
    db = _mkdb(db_path, data, rescore="host")
    assert _recall(db, data, q) == 1.0
    assert db.stats()["rescore_escalations"] > 0


def test_memmap_store_rescore(db_path, rng):
    data = _neartie_corpus(rng, n=1024)
    db = PicoVectorDB(
        embedding_dim=DIM, storage_file=db_path, storage_dtype="int8",
        index="exact", rescore="host", use_memmap=True, capacity=2048,
    )
    db.upsert([{K_ID: str(i), K_VECTOR: data[i]} for i in range(len(data))])
    q = data[rng.integers(0, len(data), 8)]
    assert _recall(db, data, q) == 1.0
