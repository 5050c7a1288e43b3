"""Embedding providers: hash embedder semantics + encoder shapes/determinism."""

import numpy as np
import pytest

from semcode_tpu.embeddings.hash_embedder import HashEmbeddings, code_tokens


def test_code_tokens_splits_identifiers():
    toks = code_tokens("def getUserName(user_id):\n    return self._cache[user_id]")
    assert "get" in toks and "user" in toks and "name" in toks
    assert "id" in toks and "cache" in toks


def test_hash_embedder_similarity_ordering():
    emb = HashEmbeddings(dim=128)
    texts = [
        "def binary_search(arr, target):\n  lo, hi = 0, len(arr)",
        "def binary_search(values, needle):\n  low, high = 0, len(values)",
        "class HttpServer:\n  def start(self, port): self.sock.listen(port)",
    ]
    vecs = np.asarray(emb.embed_documents(texts), dtype=np.float32)
    assert vecs.shape == (3, 128)
    np.testing.assert_allclose(np.linalg.norm(vecs, axis=1), 1.0, rtol=1e-4)
    q = np.asarray(emb.embed_query("binary search implementation"), dtype=np.float32)
    sims = vecs @ q
    assert sims[0] > sims[2] and sims[1] > sims[2]


def test_hash_embedder_deterministic():
    a = HashEmbeddings(dim=64).embed_query("foo bar baz")
    b = HashEmbeddings(dim=64).embed_query("foo bar baz")
    np.testing.assert_array_equal(a, b)


def test_encoder_shapes_and_determinism():
    from semcode_tpu.models.encoder import EncoderEmbeddings

    enc = EncoderEmbeddings(preset="mini", batch_size=8, max_tokens=128)
    texts = ["def f(x): return x + 1", "int main() { return 0; }"]
    vecs = np.asarray(enc.embed_documents(texts), dtype=np.float32)
    assert vecs.shape == (2, 384)
    np.testing.assert_allclose(np.linalg.norm(vecs, axis=1), 1.0, rtol=1e-4)
    q1 = enc.embed_query("def f(x): return x + 1")
    enc2 = EncoderEmbeddings(preset="mini", batch_size=8, max_tokens=128)
    q2 = enc2.embed_query("def f(x): return x + 1")
    np.testing.assert_allclose(q1, q2, atol=1e-5)
    # same text as a document vs query must produce the same vector
    np.testing.assert_allclose(q1, vecs[0], atol=1e-4)


def test_factory_dispatch(monkeypatch):
    from semcode_tpu.embeddings.providers import EmbeddingProviderFactory
    from semcode_tpu.settings import AppSettings

    cfg = AppSettings(embedding_provider="tpu-hash", embedding_dimension=64)
    provider = EmbeddingProviderFactory.create(cfg)
    assert provider.dim == 64
    cfg2 = AppSettings(embedding_provider="nope")
    with pytest.raises(NotImplementedError):
        EmbeddingProviderFactory.create(cfg2)
