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


def _tiny_bert_torch():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    cfg = transformers.BertConfig(
        vocab_size=97,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=48,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    model = transformers.BertModel(cfg).eval()
    return torch, model


def test_bert_converter_matches_torch_forward():
    """Weight-converter parity: our jitted BERT forward must reproduce the
    HF torch forward (mean-pooled + normalized) on a random-init model —
    the bit-level contract that makes `from_pretrained` on a real MiniLM
    checkpoint equivalent to the reference's SentenceTransformer embedder
    (reference: bench/st_embedding.py:13-32)."""
    torch, model = _tiny_bert_torch()
    from picovdb_tpu.models.bert_encoder import BertMeanPoolEncoder

    enc = BertMeanPoolEncoder.from_hf_torch(model, compute_dtype=None)

    rng = np.random.default_rng(3)
    B, T = 5, 48
    tokens = rng.integers(0, 97, size=(B, T)).astype(np.int64)
    mask = np.zeros((B, T), dtype=np.int64)
    for i, ln in enumerate([48, 31, 17, 9, 1]):
        mask[i, :ln] = 1

    with torch.no_grad():
        hidden = model(
            input_ids=torch.tensor(tokens),
            attention_mask=torch.tensor(mask),
        ).last_hidden_state.numpy()
    m = mask[:, :, None].astype(np.float32)
    ref = (hidden * m).sum(1) / np.maximum(m.sum(1), 1e-9)
    ref = ref / np.maximum(np.linalg.norm(ref, axis=1, keepdims=True), 1e-12)

    got = np.asarray(
        enc.embed_tokens_device(tokens.astype(np.int32), mask.astype(np.int32))
    )
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def test_bert_encoder_rag_roundtrip(db_path):
    """Converted-model embeddings drive the store end-to-end: embed texts,
    index, self-retrieve (the reference's mismatch counter,
    bench/hf_query.py:38-52)."""
    torch, model = _tiny_bert_torch()
    from picovdb_tpu.models.bert_encoder import BertMeanPoolEncoder

    def toy_tokenizer(texts, padding=None, truncation=None, max_length=None,
                      return_tensors=None):
        ids = np.zeros((len(texts), max_length), dtype=np.int64)
        mask = np.zeros((len(texts), max_length), dtype=np.int64)
        for i, t in enumerate(texts):
            bs = [1 + (b % 96) for b in t.encode()][: max_length]
            ids[i, : len(bs)] = bs
            mask[i, : len(bs)] = 1
        return {"input_ids": ids, "attention_mask": mask}

    enc = BertMeanPoolEncoder(
        BertMeanPoolEncoder.from_hf_torch(model).params,
        BertMeanPoolEncoder.from_hf_torch(model).config,
        tokenizer=toy_tokenizer,
        max_len=48,
        compute_dtype=None,
    )
    texts = [f"document number {i} about topic {i % 3}" for i in range(20)]
    vecs = enc.embed(texts)
    assert vecs.shape == (20, 32)
    np.testing.assert_allclose(np.linalg.norm(vecs, axis=1), 1.0, rtol=1e-5)

    db = PicoVectorDB(embedding_dim=32, storage_file=db_path)
    db.upsert([{K_ID: f"t{i}", K_VECTOR: vecs[i]} for i in range(20)])
    mismatches = 0
    for i, hits in enumerate(db.query_batched(vecs, top_k=1)):
        if not hits or hits[0][K_ID] != f"t{i}":
            mismatches += 1
    assert mismatches == 0


def test_word_vocab_tokenizer_roundtrip():
    from picovdb_tpu.models import WordVocabTokenizer

    texts = ["the cat sat on the mat", "a dog ate the cat's dinner"]
    tok = WordVocabTokenizer(vocab_size=64).fit(texts)
    out = tok(["the cat", "unseen zebra words"], max_length=8)
    ids, mask = out["input_ids"], out["attention_mask"]
    assert ids.shape == (2, 8) and mask.shape == (2, 8)
    # CLS + 2 words + SEP
    assert mask[0].sum() == 4 and ids[0, 0] == tok.CLS
    # unknown words map to UNK, not crash
    assert (ids[1] == tok.UNK).any()
    # deterministic across re-fits
    tok2 = WordVocabTokenizer(vocab_size=64).fit(texts)
    assert tok.vocab == tok2.vocab


def test_bert_random_init_deterministic_and_self_retrieval(db_path):
    from picovdb_tpu import PicoVectorDB
    from picovdb_tpu.models import BertConfig, BertMeanPoolEncoder

    cfg = BertConfig(
        vocab_size=128, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position=32,
    )
    texts = [f"document number {i} about topic {i % 3}" for i in range(12)]
    enc1 = BertMeanPoolEncoder.random_init(cfg, seed=7, corpus_texts=texts,
                                           max_len=16)
    enc2 = BertMeanPoolEncoder.random_init(cfg, seed=7, corpus_texts=texts,
                                           max_len=16)
    e1, e2 = enc1.embed(texts), enc2.embed(texts)
    np.testing.assert_allclose(e1, e2, atol=1e-6)  # reproducible
    np.testing.assert_allclose(
        np.linalg.norm(e1, axis=1), np.ones(len(texts)), atol=1e-5
    )
    # device pipeline: embeddings ingest without a host copy and each
    # chunk retrieves itself first (the reference's mismatch counter,
    # bench/hf_query.py:38-52)
    db = PicoVectorDB(embedding_dim=cfg.hidden_size, storage_file=db_path)
    db.ingest_device(
        enc1.embed_device(texts), ids=[f"c{i}" for i in range(len(texts))]
    )
    sids, scores = db.query_columnar(enc2.embed_device(texts), top_k=1)
    assert [s[0] for s in sids] == [f"c{i}" for i in range(len(texts))]
    assert (scores[:, 0] > 0.999).all()
