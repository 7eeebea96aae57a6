"""Embedding model tiers feeding the store (picovdb_tpu/models/)."""

import numpy as np
import pytest

from picovdb_tpu import PicoVectorDB, K_ID, K_VECTOR
from picovdb_tpu.models import HashingEmbedder

TEXTS = [
    "the glacier retreated three meters this year",
    "snow depth at the tree line doubled overnight",
    "the espresso machine needs a coarser grind at altitude",
    "shipping manifest: two anemometers and a radiosonde",
]


def test_hashing_embedder_deterministic_unit_norm():
    emb = HashingEmbedder(dim=64)
    v1 = emb.embed_one(TEXTS[0])
    v2 = emb.embed_one(TEXTS[0])
    np.testing.assert_array_equal(v1, v2)
    assert v1.dtype == np.float32
    np.testing.assert_allclose(np.linalg.norm(v1), 1.0, rtol=1e-6)
    batch = emb.embed(TEXTS)
    assert batch.shape == (4, 64)
    np.testing.assert_array_equal(batch[0], v1)


def test_hashing_embedder_similarity_orders_topics():
    emb = HashingEmbedder(dim=256)
    v = emb.embed(TEXTS + ["glacier melt and snow measurements this year"])
    sims = v[:4] @ v[4]
    # the weather/mountain sentences beat the espresso/manifest ones
    assert max(sims[0], sims[1]) > max(sims[2], sims[3])


def test_hashing_embedder_empty_text():
    emb = HashingEmbedder(dim=16)
    v = emb.embed_one("")
    np.testing.assert_allclose(np.linalg.norm(v), 1.0, rtol=1e-6)


def test_rag_roundtrip_with_hashing_embedder(db_path):
    emb = HashingEmbedder(dim=128)
    vecs = emb.embed(TEXTS)
    db = PicoVectorDB(embedding_dim=128, storage_file=db_path)
    db.upsert(
        [{K_ID: f"t{i}", K_VECTOR: vecs[i], "text": TEXTS[i]} for i in range(4)]
    )
    hits = db.query(emb.embed_one("manifest with anemometers"), top_k=1)
    assert hits[0][K_ID] == "t3"


def test_flax_encoder_device_output(db_path):
    flax = pytest.importorskip("flax")
    from picovdb_tpu.models import FlaxMeanPoolEncoder

    enc = FlaxMeanPoolEncoder(dim=64, depth=1, heads=2, max_len=32)
    out = enc.embed_device(TEXTS[:2])
    assert out.shape == (2, 64)
    arr = np.asarray(out)
    np.testing.assert_allclose(np.linalg.norm(arr, axis=1), 1.0, rtol=1e-3)
    # deterministic per instance
    again = np.asarray(enc.embed_device(TEXTS[:2]))
    np.testing.assert_allclose(arr, again, rtol=1e-5)

    # device-resident output feeds query_columnar without host round trips
    db = PicoVectorDB(embedding_dim=64, storage_file=db_path)
    corpus = enc.embed(TEXTS)
    db.upsert([{K_ID: f"c{i}", K_VECTOR: corpus[i]} for i in range(4)])
    ids, scores = db.query_columnar(enc.embed_device([TEXTS[1]]), top_k=1)
    assert ids[0][0] == "c1"
