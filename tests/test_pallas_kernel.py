"""Fused Pallas scan kernel vs NumPy oracle (interpret mode on CPU).

Differential strategy per SURVEY.md §4 implication (b): Pallas kernel vs
jnp reference vs NumPy oracle. On CPU the kernel runs in Mosaic interpret
mode; the same code path compiles on TPU (exercised by bench.py).
"""

import numpy as np
import pytest

from picovdb_tpu.ops.pallas_scan import make_fused_topk, rescore_exact, fused_topk
from picovdb_tpu.ops.exact import make_exact_topk
from picovdb_tpu.utils import normalize_batch

# Packed-key selection quantizes scores by ~2^-13 relative before the exact
# rescore; index-level agreement is asserted only where the oracle's scores
# are separated by more than that.
QUANT = 3e-4


def oracle(queries, vectors, mask, k):
    scores = queries @ vectors.T
    scores = np.where(mask[None, :], scores, -np.inf)
    order = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(scores, order, axis=1), order, scores


@pytest.mark.parametrize(
    "cap,dim,k,q,density",
    [
        (1024, 128, 4, 8, 1.0),
        (2048, 128, 10, 16, 0.7),
        (1536, 256, 33, 8, 0.5),
    ],
)
def test_fused_topk_matches_oracle(rng, cap, dim, k, q, density):
    V = normalize_batch(rng.normal(size=(cap, dim)).astype(np.float32))
    Q = normalize_batch(rng.normal(size=(q, dim)).astype(np.float32))
    mask = rng.random(cap) < density

    fn = make_fused_topk(k, None, interpret=True)
    vals, idx = map(np.asarray, fn(Q, V, mask))
    ovals, oidx, scores = oracle(Q, V, mask, k)

    np.testing.assert_allclose(vals, ovals, rtol=1e-5, atol=1e-6)
    for qi in range(q):
        # every returned index scores as well as the oracle's at that rank
        got = scores[qi][idx[qi]]
        got = np.where(np.isneginf(vals[qi]), -np.inf, got)
        np.testing.assert_allclose(got, ovals[qi], rtol=1e-5, atol=1e-6)
        strict = np.diff(ovals[qi]) < -QUANT
        same = idx[qi] == oidx[qi]
        assert (same[1:] | ~strict).all()


def test_fused_topk_underfilled_rows(rng):
    """Fewer candidates than k: padding entries are -inf, real ones exact."""
    cap, dim, k = 1024, 128, 16
    V = normalize_batch(rng.normal(size=(cap, dim)).astype(np.float32))
    Q = normalize_batch(rng.normal(size=(8, dim)).astype(np.float32))
    mask = np.zeros(cap, dtype=bool)
    mask[:5] = True

    fn = make_fused_topk(k, None, interpret=True)
    vals, idx = map(np.asarray, fn(Q, V, mask))
    assert np.isneginf(vals[:, 5:]).all()
    ovals, oidx, _ = oracle(Q, V, mask, 5)
    np.testing.assert_allclose(vals[:, :5], ovals, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(idx[:, :5], oidx)


def test_fused_topk_all_masked(rng):
    cap, dim, k = 1024, 128, 4
    V = normalize_batch(rng.normal(size=(cap, dim)).astype(np.float32))
    Q = normalize_batch(rng.normal(size=(8, dim)).astype(np.float32))
    mask = np.zeros(cap, dtype=bool)
    fn = make_fused_topk(k, None, interpret=True)
    vals, idx = map(np.asarray, fn(Q, V, mask))
    assert np.isneginf(vals).all()


def test_fused_matches_xla_path(rng):
    """The two device paths agree (the engine treats them interchangeably)."""
    cap, dim, k = 2048, 64, 8
    V = normalize_batch(rng.normal(size=(cap, dim)).astype(np.float32))
    Q = normalize_batch(rng.normal(size=(16, dim)).astype(np.float32))
    mask = rng.random(cap) > 0.4
    pv, pi = map(np.asarray, make_fused_topk(k, None, interpret=True)(Q, V, mask))
    xv, xi = map(np.asarray, make_exact_topk(k)(Q, V, mask))
    np.testing.assert_allclose(pv, xv, rtol=1e-5, atol=1e-6)
    # same candidate set wherever scores are distinct
    scores = Q @ V.T
    for qi in range(16):
        np.testing.assert_allclose(
            scores[qi][pi[qi]], scores[qi][xi[qi]], rtol=1e-5, atol=1e-6
        )


def test_bf16_compute_with_rescore(rng):
    """bf16 scoring + exact rescore: scores exact, selection near-exact."""
    cap, dim, k = 1024, 128, 8
    V = normalize_batch(rng.normal(size=(cap, dim)).astype(np.float32))
    Q = normalize_batch(rng.normal(size=(8, dim)).astype(np.float32))
    mask = np.ones(cap, dtype=bool)
    fn = make_fused_topk(k, "bfloat16", interpret=True)
    vals, idx = map(np.asarray, fn(Q, V, mask))
    ovals, oidx, scores = oracle(Q, V, mask, k)
    # rescore makes returned scores exact f32 for whatever was selected
    for qi in range(8):
        np.testing.assert_allclose(
            vals[qi], scores[qi][idx[qi]], rtol=1e-5, atol=1e-6
        )
    # selection recall under bf16 noise stays high at this scale
    recall = np.mean(
        [len(set(idx[qi]) & set(oidx[qi])) / k for qi in range(8)]
    )
    assert recall >= 0.85


def test_fused_topk_odd_dim(rng):
    """Non-128-multiple dims: blocks fall back to full-array width."""
    cap, dim, k = 1024, 100, 5
    V = normalize_batch(rng.normal(size=(cap, dim)).astype(np.float32))
    Q = normalize_batch(rng.normal(size=(8, dim)).astype(np.float32))
    mask = np.ones(cap, dtype=bool)
    fn = make_fused_topk(k, None, interpret=True)
    vals, idx = map(np.asarray, fn(Q, V, mask))
    ovals, oidx, _ = oracle(Q, V, mask, k)
    np.testing.assert_allclose(vals, ovals, rtol=1e-5, atol=1e-6)


def test_fused_topk_k_beyond_block_size(rng):
    """k larger than the scan block must not truncate (ADVICE r1: the kernel
    capped output at bn; wide-k requests now fall back to the exact scan)."""
    cap, dim, k = 1024, 128, 700
    V = normalize_batch(rng.normal(size=(cap, dim)).astype(np.float32))
    Q = normalize_batch(rng.normal(size=(8, dim)).astype(np.float32))
    mask = np.zeros(cap, dtype=bool)
    mask[:1000] = True
    fn = make_fused_topk(k, None, interpret=True)
    vals, idx = map(np.asarray, fn(Q, V, mask))
    assert vals.shape == (8, k), vals.shape
    assert np.isfinite(vals).all()  # 1000 active rows > k=700 -> all real
    ovals, oidx, _ = oracle(Q, V, mask, k)
    np.testing.assert_allclose(vals, ovals, rtol=1e-5, atol=1e-6)


def test_fused_topk_k_beyond_block_engine(db_path, rng):
    """Engine-level wide-k query returns top_k hits, not a truncated set."""
    from picovdb_tpu import PicoVectorDB, K_ID, K_VECTOR

    dim, n, k = 64, 1000, 700
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    db = PicoVectorDB(embedding_dim=dim, storage_file=db_path,
                      scan_mode="fused")
    db.upsert([{K_ID: str(i), K_VECTOR: vecs[i]} for i in range(n)])
    res = db.query(vecs[0], top_k=k)
    assert len(res) == k, len(res)


# ---------------------------------------------------------------------------
# Segmented-max scan (mixed-precision tier)
# ---------------------------------------------------------------------------

def test_segmax_topk_matches_oracle(rng):
    """segmax candidates + global top-k + f32 rescore vs NumPy oracle."""
    from picovdb_tpu.ops.pallas_scan import make_segmax_topk

    cap, dim, k, q = 8192, 128, 5, 8
    V = normalize_batch(rng.normal(size=(cap, dim)).astype(np.float32))
    Q = normalize_batch(rng.normal(size=(q, dim)).astype(np.float32))
    mask = rng.random(cap) < 0.8

    fn = make_segmax_topk(k, None, interpret=True)
    vals, idx = map(np.asarray, fn(Q, V, V, mask))
    ovals, oidx, scores = oracle(Q, V, mask, k)

    # returned scores are exact f32 for whatever was selected
    for qi in range(q):
        np.testing.assert_allclose(
            vals[qi], scores[qi][idx[qi]], rtol=1e-5, atol=1e-6
        )
    # selection: only >2-per-128-segment collisions can miss (rare)
    recall = np.mean([len(set(idx[i]) & set(oidx[i])) / k for i in range(q)])
    assert recall >= 0.95, recall


def test_segmax_bf16_scan_f32_rescore(rng):
    """Mixed tier: bf16 scan mirror for selection, f32 corpus for ranking —
    returned scores must still be exact f32."""
    from picovdb_tpu.ops.pallas_scan import make_segmax_topk
    import jax.numpy as jnp

    cap, dim, k, q = 8192, 64, 8, 8
    V = normalize_batch(rng.normal(size=(cap, dim)).astype(np.float32))
    Q = normalize_batch(rng.normal(size=(q, dim)).astype(np.float32))
    mask = np.ones(cap, dtype=bool)
    Vlp = jnp.asarray(V).astype(jnp.bfloat16)

    fn = make_segmax_topk(k, None, interpret=True)
    vals, idx = map(np.asarray, fn(Q, Vlp, V, mask))
    _, oidx, scores = oracle(Q, V, mask, k)
    for qi in range(q):
        np.testing.assert_allclose(
            vals[qi], scores[qi][idx[qi]], rtol=1e-5, atol=1e-6
        )
    recall = np.mean([len(set(idx[i]) & set(oidx[i])) / k for i in range(q)])
    assert recall >= 0.9, recall


def test_segmax_underfilled_and_all_masked(rng):
    """Per-segment top-2 is a documented truncation: candidates clustered
    in one 128-row segment surface at most 2 entries (the engine's
    underfill net re-dispatches exact in that case — tested below).
    Spread-out candidates and the all-masked case behave exactly."""
    from picovdb_tpu.ops.pallas_scan import make_segmax_topk

    cap, dim, k = 8192, 64, 10
    V = normalize_batch(rng.normal(size=(cap, dim)).astype(np.float32))
    Q = normalize_batch(rng.normal(size=(8, dim)).astype(np.float32))
    fn = make_segmax_topk(k, None, interpret=True)

    # clustered: 4 candidates in one segment -> top-2 of it, rest -inf
    mask = np.zeros(cap, dtype=bool)
    mask[:4] = True
    vals, idx = map(np.asarray, fn(Q, V, V, mask))
    assert np.isfinite(vals[:, :2]).all()
    assert np.isneginf(vals[:, 2:]).all()

    # spread: 4 candidates in distinct segments -> all exact
    mask = np.zeros(cap, dtype=bool)
    spread = [0, 400, 1000, 5000]
    mask[spread] = True
    vals, idx = map(np.asarray, fn(Q, V, V, mask))
    assert np.isfinite(vals[:, :4]).all()
    assert np.isneginf(vals[:, 4:]).all()
    scores = Q @ V.T
    for qi in range(8):
        want = sorted(spread, key=lambda s: -scores[qi][s])
        assert idx[qi][:4].tolist() == want

    mask = np.zeros(cap, dtype=bool)
    vals, idx = map(np.asarray, fn(Q, V, V, mask))
    assert np.isneginf(vals).all()


def test_engine_segmax_underfill_refetches_exact(db_path, rng):
    """Clustered active set (mass deletion leaves k+ rows in one segment):
    the engine must detect segmax underfill and return the exact result."""
    from picovdb_tpu import PicoVectorDB, K_ID
    from picovdb_tpu.device import DeviceIndex

    dim, n, k = 16, DeviceIndex.SEGMAX_MIN_CAP, 6
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    db = PicoVectorDB(
        embedding_dim=dim, storage_file=db_path, mixed_precision=True,
        scan_mode="mixed",
    )
    db.upsert_columnar(vecs, ids=[str(i) for i in range(n)], copy=False)
    # delete everything except 8 rows inside one 128-row segment
    keep = set(str(i) for i in range(256, 264))
    db.delete([str(i) for i in range(n) if str(i) not in keep])
    res = db.query(vecs[256], top_k=k)
    assert len(res) == k, len(res)  # all k surface despite clustering
    assert res[0][K_ID] == "256"
    assert db._last_topk_strategy != "segmax_mixed"  # net re-dispatched
    # columnar serving path has the same net
    ids_col, scores_col = db.query_columnar(vecs[256:258], top_k=k)
    assert (ids_col[0] != None).sum() == k  # noqa: E711



def test_engine_mixed_precision_segmax(db_path, rng):
    """Engine-level mixed tier on a CPU-interpret corpus big enough to
    cross the segmax routing threshold."""
    from picovdb_tpu import PicoVectorDB, K_ID
    from picovdb_tpu.device import DeviceIndex

    dim, n, k = 16, DeviceIndex.SEGMAX_MIN_CAP, 5
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    db = PicoVectorDB(
        embedding_dim=dim, storage_file=db_path, mixed_precision=True,
        scan_mode="mixed",  # force segmax even at tiny Q (auto would route
        # small batches to the XLA scan, see DeviceIndex.SMALL_Q_XLA)
    )
    db.upsert_columnar(vecs, ids=[str(i) for i in range(n)], copy=False)
    res = db.query(vecs[123], top_k=k)
    assert db._last_topk_strategy == "segmax_mixed"
    assert res[0][K_ID] == "123"
    # wide-k requests bypass segmax (per-segment top-2 assumption)
    res2 = db.query(vecs[7], top_k=64)
    assert db._last_topk_strategy != "segmax_mixed"
    assert res2[0][K_ID] == "7"
    # mutations keep the bf16 mirror in sync through the scatter path
    db.delete(["123"])
    res3 = db.query(vecs[123], top_k=k)
    assert db._last_topk_strategy == "segmax_mixed"
    assert all(r[K_ID] != "123" for r in res3)


def test_mixed_fused_small_q(rng):
    """Small-Q mixed path: ladder over bf16 mirror + exact f32 rescore."""
    from picovdb_tpu.ops.pallas_scan import make_mixed_fused_topk
    import jax.numpy as jnp

    cap, dim, k = 2048, 64, 6
    V = normalize_batch(rng.normal(size=(cap, dim)).astype(np.float32))
    Q = normalize_batch(rng.normal(size=(8, dim)).astype(np.float32))
    mask = rng.random(cap) > 0.3
    Vlp = jnp.asarray(V).astype(jnp.bfloat16)
    fn = make_mixed_fused_topk(k, interpret=True)
    vals, idx = map(np.asarray, fn(Q, Vlp, V, mask))
    _, oidx, scores = oracle(Q, V, mask, k)
    for qi in range(8):
        np.testing.assert_allclose(
            vals[qi], scores[qi][idx[qi]], rtol=1e-5, atol=1e-6
        )
    recall = np.mean([len(set(idx[i]) & set(oidx[i])) / k for i in range(8)])
    assert recall >= 0.9, recall


def test_engine_small_q_mixed_route(db_path, rng):
    from picovdb_tpu import PicoVectorDB, K_ID
    from picovdb_tpu.device import DeviceIndex

    dim, n = 16, DeviceIndex.SEGMAX_MIN_CAP
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    db = PicoVectorDB(
        embedding_dim=dim, storage_file=db_path, mixed_precision=True
    )
    db.upsert_columnar(vecs, ids=[str(i) for i in range(n)], copy=False)
    res = db.query(vecs[55], top_k=3)  # Q=1 -> small-Q mixed ladder
    assert db._last_topk_strategy == "mixed_fused_smallq"
    assert res[0][K_ID] == "55"
    # batch > SMALL_Q_XLA -> segmax
    out = db.query(vecs[:32], top_k=3)
    assert db._last_topk_strategy == "segmax_mixed"
    assert out[7][0][K_ID] == "7"
    # filtered single query stays exact
    r = db.query(vecs[8], top_k=2, where=lambda d: True)
    assert db._last_topk_strategy not in (
        "segmax_mixed", "mixed_fused_smallq"
    )


# --- int8 selection tier ----------------------------------------------------


def test_quantize_rows_i8_roundtrip(rng):
    from picovdb_tpu.ops.pallas_scan import quantize_rows_i8

    V = normalize_batch(rng.normal(size=(64, 128)).astype(np.float32))
    q, s = map(np.asarray, quantize_rows_i8(V))
    assert q.dtype == np.int8 and s.dtype == np.float32
    deq = q.astype(np.float32) * s[:, None]
    # symmetric per-row quantization: error bounded by half a step
    np.testing.assert_allclose(deq, V, atol=(s.max() / 2) + 1e-7)
    # all-zero rows (deleted slots) quantize to zero without dividing by 0
    z = np.zeros((4, 128), dtype=np.float32)
    qz, sz = map(np.asarray, quantize_rows_i8(z))
    assert (qz == 0).all() and np.isfinite(sz).all()


def test_fused_topk_i8_matches_oracle(rng):
    """int8 ladder + exact f32 rescore: exact scores, near-exact selection."""
    from picovdb_tpu.ops.pallas_scan import make_fused_topk_i8, quantize_rows_i8

    cap, dim, k = 2048, 128, 6
    V = normalize_batch(rng.normal(size=(cap, dim)).astype(np.float32))
    Q = normalize_batch(rng.normal(size=(4, dim)).astype(np.float32))
    mask = rng.random(cap) > 0.3
    v8, vs = quantize_rows_i8(V)
    fn = make_fused_topk_i8(k, interpret=True)
    vals, idx = map(np.asarray, fn(Q, v8, vs, V, mask))
    ovals, oidx, scores = oracle(Q, V, mask, k)
    for qi in range(4):
        # rescore makes returned scores exact for whatever was selected
        np.testing.assert_allclose(
            vals[qi], scores[qi][idx[qi]], rtol=1e-5, atol=1e-6
        )
    recall = np.mean([len(set(idx[i]) & set(oidx[i])) / k for i in range(4)])
    assert recall >= 0.9, recall


def test_fused_topk_i8_underfilled_and_all_masked(rng):
    from picovdb_tpu.ops.pallas_scan import make_fused_topk_i8, quantize_rows_i8

    cap, dim, k = 1024, 128, 8
    V = normalize_batch(rng.normal(size=(cap, dim)).astype(np.float32))
    Q = normalize_batch(rng.normal(size=(2, dim)).astype(np.float32))
    v8, vs = quantize_rows_i8(V)
    mask = np.zeros(cap, dtype=bool)
    mask[:3] = True
    fn = make_fused_topk_i8(k, interpret=True)
    vals, idx = map(np.asarray, fn(Q, v8, vs, V, mask))
    assert np.isneginf(vals[:, 3:]).all()
    ovals, oidx, _ = oracle(Q, V, mask, 3)
    np.testing.assert_allclose(vals[:, :3], ovals, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(idx[:, :3], oidx)
    vals2, _ = map(
        np.asarray, fn(Q, v8, vs, V, np.zeros(cap, dtype=bool))
    )
    assert np.isneginf(vals2).all()


def test_segmax_topk_i8_matches_oracle(rng):
    from picovdb_tpu.ops.pallas_scan import make_segmax_topk_i8, quantize_rows_i8

    cap, dim, k = 4096, 128, 8
    V = normalize_batch(rng.normal(size=(cap, dim)).astype(np.float32))
    Q = normalize_batch(rng.normal(size=(8, dim)).astype(np.float32))
    mask = rng.random(cap) > 0.2
    v8, vs = quantize_rows_i8(V)
    fn = make_segmax_topk_i8(k, interpret=True)
    vals, idx = map(np.asarray, fn(Q, v8, vs, V, mask))
    ovals, oidx, scores = oracle(Q, V, mask, k)
    for qi in range(8):
        np.testing.assert_allclose(
            vals[qi], scores[qi][idx[qi]], rtol=1e-5, atol=1e-6
        )
    recall = np.mean([len(set(idx[i]) & set(oidx[i])) / k for i in range(8)])
    assert recall >= 0.9, recall


def test_engine_int8_routes(db_path, rng, monkeypatch):
    """int8 tier routing: tiny-Q ladder, opt-in segmax, scatter maintenance."""
    from picovdb_tpu import PicoVectorDB, K_ID
    from picovdb_tpu.device import DeviceIndex

    monkeypatch.setenv("PICOVDB_SEGMAX_I8", "1")
    # routing test: disable the near-tie crowding retry (int8 noise at
    # dim=16 legitimately crowds random data's top-k band)
    monkeypatch.setenv("PICOVDB_TIE_MARGIN_SCALE", "0")
    dim, n = 16, DeviceIndex.SEGMAX_MIN_CAP
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    db = PicoVectorDB(
        embedding_dim=dim, storage_file=db_path, int8_tier=True
    )
    db.upsert_columnar(vecs, ids=[str(i) for i in range(n)], copy=False)
    res = db.query(vecs[55], top_k=3)  # Q=1 -> int8 ladder
    assert db._last_topk_strategy == "i8_fused_smallq"
    assert res[0][K_ID] == "55"
    out = db.query(vecs[:32], top_k=3)  # batch -> int8 segmax (opt-in env)
    assert db._last_topk_strategy == "segmax_i8"
    assert out[7][0][K_ID] == "7"
    # mutations keep the int8 mirror in sync through the scatter path
    db.delete(["55"])
    res2 = db.query(vecs[55], top_k=3)
    assert db._last_topk_strategy == "i8_fused_smallq"
    assert all(r[K_ID] != "55" for r in res2)
    # wide k overflows the unrolled ladder width -> not the int8 ladder
    db.query(vecs[7], top_k=13)  # 13 + guard 4 > 16
    assert db._last_topk_strategy != "i8_fused_smallq"


def test_query_serial_loop_matches_dispatch(db_path, rng):
    """query_serial_loop (the device-latency measurement path) returns the
    same winners as the per-call dispatch path, kernel in interpret mode."""
    from picovdb_tpu import PicoVectorDB
    from picovdb_tpu.device import DeviceIndex

    dim, n, k = 16, 2048, 5
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    db = PicoVectorDB(embedding_dim=dim, storage_file=db_path, int8_tier=True)
    db.upsert_columnar(vecs, ids=[str(i) for i in range(n)], copy=False)
    q = rng.normal(size=(6, dim)).astype(np.float32)
    lv, li = db.query_serial_loop(q, k)
    assert db._dev.last_strategy.endswith("_loop")
    assert lv.shape == (6, k) and li.shape == (6, k)
    pv, pi, nq, ke = db._dev.query_async(q, k, None)
    pv = np.asarray(pv)[:nq, :k]
    pi = np.asarray(pi)[:nq, :k]
    np.testing.assert_array_equal(li, pi)
    np.testing.assert_allclose(lv, pv, rtol=1e-5, atol=1e-6)


def test_segmax_stream_grid_order_bit_identical(rng):
    """Corpus-resident (stream) grid order vs classic: every output block
    is independent, so the raw packed keys must be bit-identical — only
    the HBM traffic pattern differs (pallas_scan.segmax_scan docstring)."""
    from picovdb_tpu.ops.pallas_scan import segmax_scan, segmax_scan_i8, \
        quantize_rows_i8
    import jax.numpy as jnp

    cap, dim, q = 8192, 128, 512  # several corpus tiles x 2 query tiles
    V = normalize_batch(rng.normal(size=(cap, dim)).astype(np.float32))
    Q = normalize_batch(rng.normal(size=(q, dim)).astype(np.float32))
    mask = rng.random(cap) < 0.8
    Vlp = jnp.asarray(V).astype(jnp.bfloat16)
    Qlp = jnp.asarray(Q).astype(jnp.bfloat16)

    k_classic, ns1 = segmax_scan(Qlp, Vlp, jnp.asarray(mask), None,
                                 interpret=True, raw=True)
    k_stream, ns2 = segmax_scan(Qlp, Vlp, jnp.asarray(mask), None,
                                interpret=True, raw=True, stream=True)
    assert ns1 == ns2
    np.testing.assert_array_equal(np.asarray(k_classic), np.asarray(k_stream))

    q8, _ = quantize_rows_i8(jnp.asarray(Q))
    v8, vs = quantize_rows_i8(jnp.asarray(V))
    k8c, _ = segmax_scan_i8(q8, v8, vs, jnp.asarray(mask), interpret=True)
    k8s, _ = segmax_scan_i8(q8, v8, vs, jnp.asarray(mask), interpret=True,
                            stream=True)
    np.testing.assert_array_equal(np.asarray(k8c), np.asarray(k8s))


def test_segmax_stream_topk_matches_oracle(rng):
    """End-to-end stream tier (bf16 pre-cast queries + corpus-resident
    sweep + f32 rescore) against the NumPy oracle."""
    from picovdb_tpu.ops.pallas_scan import make_segmax_topk
    import jax.numpy as jnp

    cap, dim, k, q = 8192, 64, 8, 512
    V = normalize_batch(rng.normal(size=(cap, dim)).astype(np.float32))
    Q = normalize_batch(rng.normal(size=(q, dim)).astype(np.float32))
    mask = np.ones(cap, dtype=bool)
    Vlp = jnp.asarray(V).astype(jnp.bfloat16)

    fn = make_segmax_topk(k, None, interpret=True, stream=True)
    vals, idx = map(np.asarray, fn(Q, Vlp, V, mask))
    _, oidx, scores = oracle(Q, V, mask, k)
    for qi in range(0, q, 37):
        np.testing.assert_allclose(
            vals[qi], scores[qi][idx[qi]], rtol=1e-5, atol=1e-6
        )
    recall = np.mean([len(set(idx[i]) & set(oidx[i])) / k for i in range(q)])
    assert recall >= 0.9, recall


def test_topk_packed_keys_matches_lax(rng):
    """Pallas slab top-k (pre-transpose layout) vs lax.top_k, single-chunk
    and chunked+padded (C % chunk != 0) geometries, with masked sentinels
    and underfilled columns."""
    import jax
    import jax.numpy as jnp
    from picovdb_tpu.ops.pallas_scan import KEY_MIN, topk_packed_keys

    for c, q, k_sel in ((640, 128, 16), (4160, 256, 9)):
        # distinct keys so index comparison is well-defined under ties
        keys = rng.choice(2**31 - 1, size=c * q, replace=False).astype(
            np.int64
        )
        keys = (keys - 2**30).astype(np.int32).reshape(c, q)
        keys[rng.random((c, q)) < 0.3] = KEY_MIN  # masked candidates
        keys[:, 3] = KEY_MIN  # one fully-masked (empty) query
        kt = jnp.asarray(keys)
        tk, ti = map(np.asarray, topk_packed_keys(kt, k_sel, interpret=True))
        ok, oi = map(np.asarray, jax.lax.top_k(kt.T, k_sel))
        np.testing.assert_array_equal(tk, ok)
        live = ok != KEY_MIN  # sentinel rows: any masked column is valid
        np.testing.assert_array_equal(ti[live], oi[live])


def test_engine_segmax_stream_underfill_refetches_exact(db_path, rng,
                                                        monkeypatch):
    """Same underfill net, stream grid order: the strategy then reports
    'segmax_mixed_stream', which the retry detection must still arm
    (regression: an exact-string check silently disabled the exact
    fallback for every stream-order batch)."""
    from picovdb_tpu import PicoVectorDB, K_ID
    from picovdb_tpu.device import DeviceIndex

    monkeypatch.setenv("PICOVDB_SEGMAX_STREAM", "1")
    dim, n, k = 16, DeviceIndex.SEGMAX_MIN_CAP, 6
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    db = PicoVectorDB(
        embedding_dim=dim, storage_file=db_path, mixed_precision=True,
        scan_mode="mixed",
    )
    db.upsert_columnar(vecs, ids=[str(i) for i in range(n)], copy=False)
    keep = set(str(i) for i in range(256, 264))
    db.delete([str(i) for i in range(n) if str(i) not in keep])
    ids_col, scores_col = db.query_columnar(
        np.repeat(vecs[256:257], 8, axis=0), top_k=k
    )
    assert (ids_col[0] != None).sum() == k  # noqa: E711
    assert ids_col[0][0] == "256"
    res = db.query(vecs[256], top_k=k)
    assert len(res) == k and res[0][K_ID] == "256"


# --- column-scaled int8 tier ("i8c") -----------------------------------------


def test_quantize_cols_i8_roundtrip(rng):
    from picovdb_tpu.ops.pallas_scan import quantize_cols_i8

    V = normalize_batch(rng.normal(size=(64, 128)).astype(np.float32))
    q, s = map(np.asarray, quantize_cols_i8(V))
    assert q.dtype == np.int8 and s.dtype == np.float32 and s.shape == (128,)
    deq = q.astype(np.float32) * s[None, :]
    np.testing.assert_allclose(deq, V, atol=(s.max() / 2) + 1e-7)
    # all-zero columns quantize to zero without dividing by zero
    Vz = V.copy()
    Vz[:, 7] = 0.0
    qz, sz = map(np.asarray, quantize_cols_i8(Vz))
    assert (qz[:, 7] == 0).all() and np.isfinite(sz).all()


def test_fused_topk_i8c_matches_oracle(rng):
    """i8c ladder ranks raw int32 scores; exact f32 rescore returns exact
    values; selection recall is near-exact."""
    from picovdb_tpu.ops.pallas_scan import make_fused_topk_i8c, quantize_cols_i8

    cap, dim, k = 2048, 128, 6
    V = normalize_batch(rng.normal(size=(cap, dim)).astype(np.float32))
    Q = normalize_batch(rng.normal(size=(4, dim)).astype(np.float32))
    mask = rng.random(cap) > 0.3
    v8, cs = quantize_cols_i8(V)
    fn = make_fused_topk_i8c(k, interpret=True)
    vals, idx = map(np.asarray, fn(Q, v8, cs, V, mask))
    ovals, oidx, scores = oracle(Q, V, mask, k)
    for qi in range(4):
        np.testing.assert_allclose(
            vals[qi], scores[qi][idx[qi]], rtol=1e-5, atol=1e-6
        )
    recall = np.mean([len(set(idx[i]) & set(oidx[i])) / k for i in range(4)])
    assert recall >= 0.9, recall


def test_fused_topk_i8c_underfilled_and_all_masked(rng):
    from picovdb_tpu.ops.pallas_scan import make_fused_topk_i8c, quantize_cols_i8

    cap, dim, k = 1024, 128, 8
    V = normalize_batch(rng.normal(size=(cap, dim)).astype(np.float32))
    Q = normalize_batch(rng.normal(size=(2, dim)).astype(np.float32))
    v8, cs = quantize_cols_i8(V)
    mask = np.zeros(cap, dtype=bool)
    mask[:3] = True
    fn = make_fused_topk_i8c(k, interpret=True)
    vals, idx = map(np.asarray, fn(Q, v8, cs, V, mask))
    assert np.isneginf(vals[:, 3:]).all()
    ovals, oidx, _ = oracle(Q, V, mask, 3)
    np.testing.assert_allclose(vals[:, :3], ovals, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(idx[:, :3], oidx)
    vals2, _ = map(np.asarray, fn(Q, v8, cs, V, np.zeros(cap, dtype=bool)))
    assert np.isneginf(vals2).all()


def test_segmax_topk_i8c_matches_oracle(rng):
    from picovdb_tpu.ops.pallas_scan import make_segmax_topk_i8c, quantize_cols_i8

    cap, dim, k = 4096, 128, 8
    V = normalize_batch(rng.normal(size=(cap, dim)).astype(np.float32))
    Q = normalize_batch(rng.normal(size=(8, dim)).astype(np.float32))
    mask = rng.random(cap) > 0.2
    v8, cs = quantize_cols_i8(V)
    fn = make_segmax_topk_i8c(k, interpret=True)
    vals, idx = map(np.asarray, fn(Q, v8, cs, V, mask))
    ovals, oidx, scores = oracle(Q, V, mask, k)
    for qi in range(8):
        np.testing.assert_allclose(
            vals[qi], scores[qi][idx[qi]], rtol=1e-5, atol=1e-6
        )
    recall = np.mean([len(set(idx[i]) & set(oidx[i])) / k for i in range(8)])
    assert recall >= 0.9, recall


def test_segmax_topk_i8c_stream_matches_classic(rng):
    """Stream (corpus-resident) and classic grid orders select identically."""
    from picovdb_tpu.ops.pallas_scan import make_segmax_topk_i8c, quantize_cols_i8

    cap, dim, k = 4096, 128, 5
    V = normalize_batch(rng.normal(size=(cap, dim)).astype(np.float32))
    Q = normalize_batch(rng.normal(size=(8, dim)).astype(np.float32))
    mask = rng.random(cap) > 0.5
    v8, cs = quantize_cols_i8(V)
    f_classic = make_segmax_topk_i8c(k, interpret=True, stream=False)
    f_stream = make_segmax_topk_i8c(k, interpret=True, stream=True)
    v1, i1 = map(np.asarray, f_classic(Q, v8, cs, V, mask))
    v2, i2 = map(np.asarray, f_stream(Q, v8, cs, V, mask))
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(v1, v2, rtol=1e-6, atol=1e-7)


def test_engine_i8c_routes(db_path, rng, monkeypatch):
    """Column-scaled int8 routing: batch segmax + tiny-Q ladder opt-ins,
    mirror maintenance through the scatter path (full requantize)."""
    from picovdb_tpu import PicoVectorDB, K_ID
    from picovdb_tpu.device import DeviceIndex

    monkeypatch.setenv("PICOVDB_SEGMAX_I8C", "1")
    monkeypatch.setenv("PICOVDB_SMALLQ_I8C", "1")
    monkeypatch.setenv("PICOVDB_TIE_MARGIN_SCALE", "0")  # routing test
    dim, n = 16, DeviceIndex.SEGMAX_MIN_CAP
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    db = PicoVectorDB(
        embedding_dim=dim, storage_file=db_path, int8_tier=True
    )
    db.upsert_columnar(vecs, ids=[str(i) for i in range(n)], copy=False)
    res = db.query(vecs[55], top_k=3)  # Q=1 -> i8c ladder
    assert db._last_topk_strategy == "i8c_fused_smallq"
    assert res[0][K_ID] == "55"
    out = db.query(vecs[:32], top_k=3)  # batch -> i8c segmax
    assert db._last_topk_strategy.startswith("segmax_i8c")
    assert out[7][0][K_ID] == "7"
    # mutations rebuild the column-scaled mirror (scales are corpus-global)
    db.delete(["55"])
    res2 = db.query(vecs[55], top_k=3)
    assert db._last_topk_strategy == "i8c_fused_smallq"
    assert all(r[K_ID] != "55" for r in res2)
    # an upserted row that exceeds every column max still wins exactly
    big = np.full(dim, 3.0, dtype=np.float32)
    db.upsert([{K_ID: "big", "_vector_": big}])
    res3 = db.query(big, top_k=1)
    assert res3[0][K_ID] == "big"


def test_mixed_fused_batch_filtered_route(rng):
    """Filtered (or wide-k) batches route to the bf16-mirror exact LADDER
    (no segmax truncation risk under clustered filters) and match the
    oracle over the filtered candidate set."""
    from picovdb_tpu.device import DeviceIndex

    dim, n, k = 32, 4096, 5
    V = normalize_batch(rng.normal(size=(n, dim)).astype(np.float32))
    dev = DeviceIndex(dim, use_pallas=True, mixed_precision=True,
                      scan_mode="auto")
    dev.full_upload(V, np.ones(n, dtype=bool))
    assert dev.vectors_lp is not None
    Q = normalize_batch(rng.normal(size=(32, dim)).astype(np.float32))
    fmask = rng.random(n) > 0.6  # a filter -> segmax must not serve
    vals, idxs, nq, ke = dev.query_async(Q, k, fmask)
    assert dev.last_strategy == "mixed_fused_batch_filtered"
    vals = np.asarray(vals)[:nq, :ke]
    idxs = np.asarray(idxs)[:nq, :ke]
    ovals, oidx, scores = oracle(Q, V, fmask, k)
    for qi in range(32):
        np.testing.assert_allclose(
            vals[qi], scores[qi][idxs[qi]], rtol=1e-5, atol=1e-6
        )
    recall = np.mean(
        [len(set(idxs[i]) & set(oidx[i])) / k for i in range(32)]
    )
    assert recall >= 0.95, recall


def test_near_duplicate_crowding_retries_exact(db_path, rng):
    """Near-duplicate corpora saturate the low-precision guard band; the
    crowding mark must steer those queries to the exact retry (measured
    failure without it: 40/64 wrong top-1 at dim=16, spread 0.015)."""
    from picovdb_tpu import PicoVectorDB, K_ID

    dim, n = 16, 40960
    centers = normalize_batch(rng.normal(size=(8, dim)).astype(np.float32))
    V = normalize_batch(
        centers[rng.integers(0, 8, n)]
        + 0.015 * rng.normal(size=(n, dim)).astype(np.float32)
    )
    db = PicoVectorDB(embedding_dim=dim, storage_file=db_path,
                      int8_tier=True, mixed_precision=True)
    db.upsert_columnar(V, ids=[str(i) for i in range(n)], copy=False)
    Vn = normalize_batch(V.copy())
    for i in range(16):
        res = db.query(V[i], top_k=1)
        got = int(res[0][K_ID])
        # the returned winner's true score must match the self-match
        assert float(Vn[i] @ Vn[got]) >= float(Vn[i] @ Vn[i]) - 1e-6, (i, got)
    # batch (segmax) path too
    out = db.query(V[:32], top_k=3)
    for i in range(32):
        got = int(out[i][0][K_ID])
        assert float(Vn[i] @ Vn[got]) >= float(Vn[i] @ Vn[i]) - 1e-6


def test_separated_data_does_not_trigger_crowding(db_path, rng):
    """Well-separated corpora must keep the fast tiers (no retry storm)."""
    from picovdb_tpu import PicoVectorDB
    from picovdb_tpu.device import DeviceIndex

    dim, n = 64, DeviceIndex.SEGMAX_MIN_CAP
    V = rng.normal(size=(n, dim)).astype(np.float32)
    db = PicoVectorDB(embedding_dim=dim, storage_file=db_path,
                      int8_tier=True, mixed_precision=True)
    db.upsert_columnar(V, ids=[str(i) for i in range(n)], copy=False)
    db.query(V[7], top_k=3)
    assert db._last_topk_strategy == "i8_fused_smallq"
    db.query(V[:64], top_k=3)
    assert db._last_topk_strategy.startswith("segmax")


def test_fused_topk_i4_underfilled_and_all_masked(rng):
    """r5 review: fused_topk_i4 returned the FINITE float32-min sentinel
    for underfilled slots (every sibling converts to -inf), so the
    dequantizing rescore's isneginf pinning missed them and masked rows
    came back as live hits."""
    from picovdb_tpu.ops.pallas_scan import (
        make_fused_topk_i4, quantize_rows_i4,
    )

    cap, dim, k = 1024, 128, 8
    V = normalize_batch(rng.normal(size=(cap, dim)).astype(np.float32))
    Q = normalize_batch(rng.normal(size=(2, dim)).astype(np.float32))
    v4, vs = quantize_rows_i4(V)
    mask = np.zeros(cap, dtype=bool)
    mask[:3] = True
    fn = make_fused_topk_i4(k, interpret=True)
    vals, idx = map(np.asarray, fn(Q, v4, vs, mask))
    assert np.isneginf(vals[:, 3:]).all()  # was: finite sentinel scores
    assert set(np.unique(idx[:, :3])) <= {0, 1, 2}
    vals2, _ = map(np.asarray, fn(Q, v4, vs, np.zeros(cap, dtype=bool)))
    assert np.isneginf(vals2).all()


def test_fused_topk_i8_dense_fallback_underfill(rng):
    """r5 review: the k>bn dense XLA fallbacks of the int8/int8c/int4
    kernels skipped the sentinel->-inf conversion too."""
    from picovdb_tpu.ops.pallas_scan import (
        make_fused_topk_i8, quantize_rows_i8,
    )

    cap, dim, k = 1024, 128, 640  # k+guard > any VMEM block -> dense
    V = normalize_batch(rng.normal(size=(cap, dim)).astype(np.float32))
    Q = normalize_batch(rng.normal(size=(2, dim)).astype(np.float32))
    v8, vs = quantize_rows_i8(V)
    mask = np.zeros(cap, dtype=bool)
    mask[:5] = True
    fn = make_fused_topk_i8(k, interpret=True)
    vals, idx = map(np.asarray, fn(Q, v8, vs, V, mask))
    assert np.isneginf(vals[:, 5:]).all()
    assert set(np.unique(idx[:, :5])) <= set(range(5))
