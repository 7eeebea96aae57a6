"""Compacted-view segmax for filtered big batches (VERDICT r3 item 8).

Filtered batches could not ride the segmax tier because a clustered
filter can pack many true winners into one 128-row segment of the full
corpus (the same reason the reference skips FAISS under filters,
picovdb/pico_vdb.py:667-668). The compacted view gathers the surviving
rows dense on device, which spreads them uniformly across the view's
segments — restoring exactly the unfiltered statistical contract at n_f
rows — and translates candidate ids back to global slots before the
exact f32 rescore (ops/pallas_scan.py make_segmax_topk slot_map).

Assertion style follows test_pallas_kernel's segmax tests: returned
scores must be exact f32 for whatever was selected AND inside the
filter; selection recall vs the filtered oracle is thresholded (only
>2-per-128-segment collisions can miss — rare at production scale, and
bounded identically to the unfiltered tier at n_f rows).
"""

import numpy as np
import pytest

from picovdb_tpu import PicoVectorDB, K_ID, K_VECTOR
from picovdb_tpu.utils import normalize_batch

DIM = 32
N = 8192


def _mkdb(db_path, data, **kw):
    db = PicoVectorDB(
        embedding_dim=DIM, storage_file=db_path, index="exact",
        scan_mode="mixed", **kw,
    )
    db._dev.SEGMAX_MIN_CAP = 1024  # segmax normally needs a 32k corpus
    db.upsert([
        {K_ID: str(i), K_VECTOR: data[i], "tag": i % 2}
        for i in range(len(data))
    ])
    return db


def _oracle(data, live_idx, q, k):
    """Exact filtered top-k over the stored (normalized) rows: full score
    matrix (dead rows -inf) + the oracle id set per query."""
    stored = normalize_batch(data.copy())
    s = np.full((q.shape[0], data.shape[0]), -np.inf, dtype=np.float64)
    s[:, live_idx] = (
        normalize_batch(q.copy()).astype(np.float64)
        @ stored[live_idx].astype(np.float64).T
    )
    oidx = np.argsort(-s, axis=1)[:, :k]
    return s, oidx


def _check(ids_col, scores_col, s, oidx, k, allowed):
    nq = len(ids_col)
    for qi in range(nq):
        got = np.array([int(x) for x in ids_col[qi]])
        assert np.isin(got, allowed).all()  # filter honored
        np.testing.assert_allclose(  # rescore exactness for the selected
            scores_col[qi], s[qi][got], rtol=1e-5, atol=1e-6
        )
    recall = np.mean([
        len({int(x) for x in ids_col[qi]} & set(oidx[qi].tolist())) / k
        for qi in range(nq)
    ])
    assert recall >= 0.95, recall


def test_fview_routes_and_matches_oracle(db_path, rng):
    data = rng.normal(size=(N, DIM)).astype(np.float32)
    db = _mkdb(db_path, data)
    q = rng.normal(size=(32, DIM)).astype(np.float32)
    k = 5
    ids_col, scores_col = db.query_columnar(q, top_k=k, where={"tag": 1})
    assert db._last_topk_strategy.startswith("fview_segmax"), (
        db._last_topk_strategy
    )
    live = np.arange(1, N, 2)
    s, oidx = _oracle(data, live, q, k)
    _check(ids_col, scores_col, s, oidx, k, live)


def test_fview_clustered_ids_filter(db_path, rng):
    """The adversarial case that forbids full-corpus segmax under filters:
    a CONTIGUOUS ids prefilter (all survivors in a few full-corpus
    segments). Compaction spreads them across the view."""
    data = rng.normal(size=(N, DIM)).astype(np.float32)
    db = _mkdb(db_path, data)
    lo, hi = 128, 128 + 4096
    id_list = [str(i) for i in range(lo, hi)]
    q = rng.normal(size=(32, DIM)).astype(np.float32)
    k = 5
    ids_col, scores_col = db.query_columnar(q, top_k=k, ids=id_list)
    assert db._last_topk_strategy.startswith("fview_segmax"), (
        db._last_topk_strategy
    )
    live = np.arange(lo, hi)
    s, oidx = _oracle(data, live, q, k)
    _check(ids_col, scores_col, s, oidx, k, live)


def test_fview_cache_reuse_and_mutation_invalidation(db_path, rng):
    data = rng.normal(size=(N, DIM)).astype(np.float32)
    db = _mkdb(db_path, data)
    q = rng.normal(size=(24, DIM)).astype(np.float32)
    db.query_columnar(q, top_k=5, where={"tag": 0})
    assert len(db._dev._fview_cache) == 1
    key, view = next(iter(db._dev._fview_cache.items()))
    db.query_columnar(q, top_k=5, where={"tag": 0})
    assert db._dev._fview_cache.get(key) is view  # reused, not rebuilt

    # any row mutation clears the cache with the mask cache
    db.upsert([{K_ID: "extra", K_VECTOR: np.ones(DIM, np.float32),
                "tag": 0}])
    res_ids, _ = db.query_columnar(
        normalize_batch(np.ones((17, DIM), np.float32)), top_k=1,
        where={"tag": 0},
    )
    assert res_ids[0][0] == "extra"  # fresh view sees the new row


def test_fview_small_survivor_set_falls_back(db_path, rng):
    """Below SEGMAX_MIN_CAP survivors the view does not pay; the filtered
    ladder/XLA fallback serves — exactly (no truncation there)."""
    data = rng.normal(size=(N, DIM)).astype(np.float32)
    db = _mkdb(db_path, data)
    id_list = [str(i) for i in range(200)]  # 200 < SEGMAX_MIN_CAP (1024)
    q = rng.normal(size=(32, DIM)).astype(np.float32)
    k = 5
    ids_col, scores_col = db.query_columnar(q, top_k=k, ids=id_list)
    assert not db._last_topk_strategy.startswith("fview"), (
        db._last_topk_strategy
    )
    live = np.arange(200)
    s, oidx = _oracle(data, live, q, k)
    for qi in range(32):  # exact match: the fallback has no truncation
        got = np.array([int(x) for x in ids_col[qi]])
        np.testing.assert_allclose(
            scores_col[qi], np.take_along_axis(s, oidx, axis=1)[qi],
            rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            s[qi][got], s[qi][oidx[qi]], rtol=1e-5, atol=1e-6
        )
