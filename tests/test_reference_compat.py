"""Differential compatibility against the actual reference implementation.

When `PICOVDB_REFERENCE_DIR` points at a checkout of wensheng/picovdb
(this repo's tests/conftest.py opts in to the known development-environment
checkout), these tests create stores with the *reference code itself* and
load them with this engine — and vice versa — proving on-disk format and
semantic parity directly rather than by reimplementation. The explicit
env-var gate means the suite never auto-imports code from a fixed path in
other environments (supply-chain hygiene); skipped cleanly when unset.
"""

import os
import sys

import numpy as np
import pytest

from picovdb_tpu import PicoVectorDB, K_ID, K_METRICS, K_VECTOR

REFERENCE_DIR = os.environ.get("PICOVDB_REFERENCE_DIR", "")

ref_available = bool(REFERENCE_DIR) and os.path.isdir(
    os.path.join(REFERENCE_DIR, "picovdb")
)
pytestmark = pytest.mark.skipif(
    not ref_available,
    reason="PICOVDB_REFERENCE_DIR not set to a reference checkout",
)


@pytest.fixture()
def ref_mod():
    sys.path.insert(0, REFERENCE_DIR)
    try:
        import picovdb as ref

        yield ref
    finally:
        sys.path.remove(REFERENCE_DIR)


def test_reference_store_loads_here(tmp_path, rng, ref_mod):
    base = str(tmp_path / "refstore")
    vecs = rng.normal(size=(50, 24)).astype(np.float32)
    ref_db = ref_mod.PicoVectorDB(embedding_dim=24, storage_file=base)
    ref_db.upsert(
        [
            {"_id_": f"r{i}", "_vector_": vecs[i], "tag": i % 3}
            for i in range(50)
        ]
    )
    ref_db.store_additional_data(note="from-reference")
    ref_db.save()

    db = PicoVectorDB(embedding_dim=24, storage_file=base)
    assert db.count() == 50
    assert db.get_additional_data()["note"] == "from-reference"
    hits = db.query(vecs[7], top_k=3)
    ref_hits = ref_db.query(vecs[7], top_k=3)
    assert [h[K_ID] for h in hits] == [h["_id_"] for h in ref_hits]
    np.testing.assert_allclose(
        [h[K_METRICS] for h in hits],
        [h["_metrics_"] for h in ref_hits],
        atol=1e-5,
    )
    rec = db.get("r3", include_vector=True)
    ref_rec = ref_db.get("r3", include_vector=True)
    assert rec["tag"] == ref_rec["tag"] == 0
    np.testing.assert_array_equal(rec[K_VECTOR], ref_rec["_vector_"])


def test_our_store_loads_in_reference(tmp_path, rng, ref_mod):
    base = str(tmp_path / "ourstore")
    vecs = rng.normal(size=(40, 16)).astype(np.float32)
    db = PicoVectorDB(embedding_dim=16, storage_file=base)
    db.upsert(
        [{K_ID: f"o{i}", K_VECTOR: vecs[i], "n": i} for i in range(40)]
    )
    db.delete(["o5"])
    db.save()

    ref_db = ref_mod.PicoVectorDB(embedding_dim=16, storage_file=base)
    assert ref_db.count() == 39
    assert ref_db.get("o5") is None
    top = ref_db.query(vecs[11], top_k=1)[0]
    assert top["_id_"] == "o11"
    assert top["n"] == 11


def test_md5_auto_ids_match_reference(tmp_path, rng, ref_mod):
    """Auto-generated content IDs must be byte-identical so id-less
    upserts into a reference-created store update instead of duplicating
    (round-1 advisor finding, fixed via bit-exact normalize_batch)."""
    vecs = rng.normal(size=(64, 32)).astype(np.float32)
    ref_db = ref_mod.PicoVectorDB(
        embedding_dim=32, storage_file=str(tmp_path / "ids_ref")
    )
    ref_report = ref_db.upsert([{"_vector_": v.copy()} for v in vecs])
    db = PicoVectorDB(
        embedding_dim=32, storage_file=str(tmp_path / "ids_our")
    )
    report = db.upsert([{K_VECTOR: v.copy()} for v in vecs])
    assert report["insert"] == ref_report["insert"]


def test_query_semantics_parity_on_random_workload(tmp_path, rng, ref_mod):
    """Same mutation + query sequence on both engines -> same results
    (ids and scores), including filters and better_than floors."""
    vecs = rng.normal(size=(80, 16)).astype(np.float32)
    items_ref = [
        {"_id_": f"x{i}", "_vector_": vecs[i].copy(), "b": i % 4}
        for i in range(80)
    ]
    items_our = [
        {K_ID: f"x{i}", K_VECTOR: vecs[i].copy(), "b": i % 4}
        for i in range(80)
    ]
    ref_db = ref_mod.PicoVectorDB(
        embedding_dim=16, storage_file=str(tmp_path / "w_ref"), no_faiss=True
    )
    db = PicoVectorDB(
        embedding_dim=16, storage_file=str(tmp_path / "w_our")
    )
    ref_db.upsert(items_ref)
    db.upsert(items_our)
    for d in (ref_db, db):
        d.delete(["x3", "x40"])

    q = rng.normal(size=16).astype(np.float32)
    for kwargs in (
        dict(top_k=5),
        dict(top_k=5, better_than=0.1),
        dict(top_k=8, where={"b": 2}),
        dict(top_k=64),
    ):
        ours = db.query(q.copy(), **kwargs)
        refs = ref_db.query(q.copy(), **kwargs)
        assert [h[K_ID] for h in ours] == [h["_id_"] for h in refs], kwargs
        np.testing.assert_allclose(
            [h[K_METRICS] for h in ours],
            [h["_metrics_"] for h in refs],
            atol=1e-5,
        )


def test_empty_store_return_shape_parity(tmp_path, rng, ref_mod):
    """Single-vector queries on empty / fully-filtered stores return [[]],
    exactly like the reference's early return (pico_vdb.py:595-596,
    672-673) — the last observable API divergence, closed in round 3."""
    ref_db = ref_mod.PicoVectorDB(
        embedding_dim=8, storage_file=str(tmp_path / "e_ref"), no_faiss=True
    )
    db = PicoVectorDB(embedding_dim=8, storage_file=str(tmp_path / "e_our"))
    q = rng.normal(size=8).astype(np.float32)
    assert db.query(q.copy()) == ref_db.query(q.copy()) == [[]]
    assert (
        db.query(np.stack([q, q]))
        == ref_db.query(np.stack([q, q]))
        == [[], []]
    )
    # populated but fully filtered out
    ref_db.upsert([{"_id_": "a", "_vector_": q.copy(), "t": 1}])
    db.upsert([{K_ID: "a", K_VECTOR: q.copy(), "t": 1}])
    assert (
        db.query(q.copy(), where={"t": 2})
        == ref_db.query(q.copy(), where={"t": 2})
        == [[]]
    )
    assert (
        db.query(q.copy(), ids=["missing"])
        == ref_db.query(q.copy(), ids=["missing"])
        == [[]]
    )
