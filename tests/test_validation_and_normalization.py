"""Input validation and zero-safe normalization.

Mirrors tests/test_task3_input_validation.py and
tests/test_task5_zero_vector_normalization.py of the reference.
"""

import numpy as np
import pytest

from picovdb_tpu import PicoVectorDB, K_ID, K_VECTOR
from picovdb_tpu.utils import normalize, normalize_batch
from conftest import make_items


def test_upsert_rejects_wrong_dim(db_path):
    db = PicoVectorDB(embedding_dim=8, storage_file=db_path)
    with pytest.raises(ValueError, match="dim mismatch"):
        db.upsert([{K_ID: "x", K_VECTOR: np.ones(7, dtype=np.float32)}])


def test_upsert_rejects_2d_vector(db_path):
    db = PicoVectorDB(embedding_dim=8, storage_file=db_path)
    with pytest.raises(ValueError, match="must be 1D"):
        db.upsert([{K_ID: "x", K_VECTOR: np.ones((2, 8), dtype=np.float32)}])


def test_query_rejects_wrong_dims(db_path, rng):
    db = PicoVectorDB(embedding_dim=8, storage_file=db_path)
    items, _ = make_items(rng, 3, 8)
    db.upsert(items)
    with pytest.raises(ValueError, match="dim mismatch"):
        db.query(np.ones(7, dtype=np.float32))
    with pytest.raises(ValueError, match="dim mismatch"):
        db.query(np.ones((2, 9), dtype=np.float32))
    with pytest.raises(ValueError, match="1D or 2D"):
        db.query(np.ones((1, 2, 8), dtype=np.float32))


def test_zero_vector_maps_to_e0():
    z = np.zeros(6, dtype=np.float32)
    n = normalize(z)
    expected = np.zeros(6, dtype=np.float32)
    expected[0] = 1.0
    np.testing.assert_array_equal(n, expected)
    # idempotent
    np.testing.assert_array_equal(normalize(n), expected)


def test_zero_vector_batch_matches_single(rng):
    mat = rng.normal(size=(4, 6)).astype(np.float32)
    mat[2] = 0.0
    out = normalize_batch(mat)
    for i in range(4):
        np.testing.assert_allclose(out[i], normalize(mat[i]), rtol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, rtol=1e-6)


def test_zero_query_is_deterministic(db_path, rng):
    db = PicoVectorDB(embedding_dim=8, storage_file=db_path)
    items, _ = make_items(rng, 10, 8)
    db.upsert(items)
    z = np.zeros(8, dtype=np.float32)
    r1 = db.query(z, top_k=3)
    r2 = db.query(z, top_k=3)
    assert [x[K_ID] for x in r1] == [x[K_ID] for x in r2]


def test_zero_vector_upsert_searchable(db_path):
    db = PicoVectorDB(embedding_dim=8, storage_file=db_path)
    z = np.zeros(8, dtype=np.float32)
    rep = db.upsert([{K_ID: "zero", K_VECTOR: z}])
    assert rep["insert"] == ["zero"]
    e0 = np.zeros(8, dtype=np.float32)
    e0[0] = 1.0
    res = db.query(e0, top_k=1)
    assert res[0][K_ID] == "zero"


def test_non_contiguous_and_fortran_inputs_accepted(db_path, rng):
    db = PicoVectorDB(embedding_dim=8, storage_file=db_path)
    items, vecs = make_items(rng, 10, 8)
    db.upsert(items)
    # Fortran-ordered batch query (reference: test_task17)
    batch = np.asfortranarray(vecs[:3].astype(np.float64))
    res = db.query(batch, top_k=1)
    assert [r[0][K_ID] for r in res] == ["id0", "id1", "id2"]
    # strided single query
    strided = vecs[::2][1]
    res1 = db.query(strided, top_k=1)
    assert res1[0][K_ID] == "id2"
