"""Utility-layer behaviors (paths, hashing, timing, rounding).

Mirrors the utils coverage in the reference's tests/test_more.py:20-80.
"""

import logging

import numpy as np

from picovdb_tpu.utils import (
    ann_path,
    hash_rows,
    hash_vec,
    ids_path,
    meta_path,
    next_pow2,
    normalize,
    normalize_batch,
    round_up,
    timed,
    to_c_f32,
    vecs_path,
)


def test_path_naming():
    assert ids_path("/x/store") == "/x/store.ids.json"
    assert meta_path("/x/store") == "/x/store.meta.json"
    assert vecs_path("/x/store") == "/x/store.vecs.npy"
    assert ann_path("/x/store") == "/x/store.vecs.npy.ivf.npz"


def test_hash_vec_is_content_md5():
    v = np.arange(8, dtype=np.float32)
    h1 = hash_vec(v)
    h2 = hash_vec(v.copy())
    assert h1 == h2
    assert len(h1) == 32
    assert hash_vec(v + 1) != h1
    # strided views hash by content, not layout
    w = np.zeros((8, 2), dtype=np.float32)
    w[:, 0] = v
    assert hash_vec(w[:, 0]) == h1


def test_hash_rows_matches_per_row():
    m = np.random.default_rng(0).normal(size=(5, 8)).astype(np.float32)
    assert hash_rows(m) == [hash_vec(m[i]) for i in range(5)]


def test_to_c_f32():
    a = np.asfortranarray(np.ones((4, 4), dtype=np.float64))
    out = to_c_f32(a)
    assert out.dtype == np.float32
    assert out.flags["C_CONTIGUOUS"]


def test_timed_logs_at_debug(caplog):
    @timed("myop")
    def f(x):
        return x + 1

    with caplog.at_level(logging.DEBUG, logger="picovdb_tpu"):
        assert f(1) == 2
    assert any(
        r.getMessage().startswith("myop took") for r in caplog.records
    )


def test_rounding_helpers():
    assert next_pow2(1) == 1
    assert next_pow2(3) == 4
    assert next_pow2(1024) == 1024
    assert next_pow2(1025) == 2048
    assert round_up(1, 8192) == 8192
    assert round_up(8192, 8192) == 8192
    assert round_up(8193, 8192) == 16384


def test_normalize_preserves_direction():
    v = np.array([3.0, 4.0], dtype=np.float32)
    n = normalize(v)
    np.testing.assert_allclose(n, [0.6, 0.8], rtol=1e-6)


def test_normalize_batch_bitwise_matches_reference_algorithm(rng):
    """Batch normalization must be bit-identical to the reference's
    per-vector `vec / np.linalg.norm(vec)` (picovdb/pico_vdb.py:58-68), or
    md5 auto-IDs diverge between stores (ADVICE r1, medium)."""
    import hashlib

    m = rng.normal(size=(4096, 257)).astype(np.float32)
    batch = normalize_batch(m)
    for i in range(0, 4096, 37):
        ref = (m[i] / np.linalg.norm(m[i])).astype(np.float32)
        assert batch[i].tobytes() == ref.tobytes(), i
        assert (
            hashlib.md5(batch[i].tobytes()).hexdigest()
            == hashlib.md5(ref.tobytes()).hexdigest()
        )


def test_normalize_batch_inplace(rng):
    m = rng.normal(size=(64, 32)).astype(np.float32)
    expect = normalize_batch(m.copy())
    out = normalize_batch(m, inplace=True)
    assert out is m  # no reallocation
    np.testing.assert_array_equal(out, expect)


def test_normalize_batch_inplace_zero_rows(rng):
    m = rng.normal(size=(8, 16)).astype(np.float32)
    m[3] = 0.0
    out = normalize_batch(m, inplace=True)
    expect = np.zeros(16, dtype=np.float32)
    expect[0] = 1.0
    np.testing.assert_array_equal(out[3], expect)
