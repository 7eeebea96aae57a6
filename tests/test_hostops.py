"""Native host-ops extension: build, parity with the Python loop, fallback.

The reference's only native component is third-party (faiss-cpu); this
framework's host-side native code is first-party and must be optional —
identical results with and without it.
"""

import numpy as np
import pytest

from picovdb_tpu import PicoVectorDB, K_ID, K_METRICS, K_VECTOR
from picovdb_tpu import hostops
from conftest import make_items


def _python_assemble(db, vals, idxs, docs, top_k, better_than):
    """Reference loop (engine fallback) invoked directly."""
    out = []
    for qi in range(vals.shape[0]):
        row = []
        for idx, score in zip(idxs[qi].tolist(), vals[qi].tolist()):
            if idx < 0 or idx >= len(docs):
                continue
            if score == float("-inf") or score != score:
                continue
            doc = docs[idx]
            if doc is None:
                continue
            if better_than is not None and score < better_than:
                continue
            row.append({**doc, K_METRICS: score})
            if len(row) == top_k:
                break
        out.append(row)
    return out


@pytest.fixture(scope="module")
def ext():
    mod = hostops.get()
    if mod is None:
        pytest.skip("no C++ toolchain available")
    return mod


def test_assemble_parity(ext, rng):
    docs = [{"_id_": f"d{i}", "n": i} if i % 5 else None for i in range(50)]
    vals = rng.normal(size=(6, 8)).astype(np.float32)
    idxs = rng.integers(-2, 55, size=(6, 8)).astype(np.int32)
    vals[0, 3] = -np.inf
    vals[1, 0] = np.nan
    for better in (None, 0.2):
        got = ext.assemble(vals, idxs, docs, K_METRICS, 4, better)
        want = _python_assemble(None, vals, idxs, docs, 4, better)
        assert got == want


def test_assemble_copy_isolation(ext):
    docs = [{"_id_": "a", "tag": 1}]
    vals = np.array([[0.5]], dtype=np.float32)
    idxs = np.array([[0]], dtype=np.int32)
    out = ext.assemble(vals, idxs, docs, K_METRICS, 1, None)
    out[0][0]["tag"] = 999
    assert docs[0]["tag"] == 1  # result dicts are copies


def test_engine_uses_native_and_matches_fallback(db_path, rng, monkeypatch):
    db = PicoVectorDB(embedding_dim=16, storage_file=db_path)
    items, vecs = make_items(rng, 60, 16, extra=lambda i: {"tag": i % 3})
    db.upsert(items)
    res_native = db.query(vecs[:4], top_k=5, better_than=-0.5)

    monkeypatch.setenv("PICOVDB_NO_NATIVE", "1")
    monkeypatch.setattr(hostops, "_ext", None)
    monkeypatch.setattr(hostops, "_tried", False)
    res_py = db.query(vecs[:4], top_k=5, better_than=-0.5)
    assert res_native == res_py


def test_fallback_when_disabled(monkeypatch):
    monkeypatch.setenv("PICOVDB_NO_NATIVE", "1")
    monkeypatch.setattr(hostops, "_ext", None)
    monkeypatch.setattr(hostops, "_tried", False)
    assert hostops.get() is None
