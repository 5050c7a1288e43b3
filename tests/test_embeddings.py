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


def test_hybrid_provider_concat_and_norm():
    """tpu-hybrid concatenates scaled unit parts: dim = hash + encoder,
    norms stay 1, and the weight splits the score mix."""
    import numpy as np

    from semcode_tpu.embeddings import EmbeddingProviderFactory
    from semcode_tpu.settings import AppSettings

    cfg = AppSettings(
        workspace_root=None,
        embedding_provider="tpu-hybrid",
        embedding_dimension=32,
        encoder_preset="mini",
        embedding_max_tokens=32,
        embedding_hybrid_weight=0.25,
    )
    emb = EmbeddingProviderFactory.create(cfg)
    assert emb.dim == 32 + 384
    # adaptive query weighting: a prose query shifts toward the encoder
    # (w + shift), an identifier-bearing query toward the hash part
    q = np.asarray(emb.embed_query("parse config file"))
    assert q.shape == (emb.dim,)
    assert abs(np.linalg.norm(q) - 1.0) < 1e-4
    w_prose = 0.25 + emb.adaptive_shift
    assert abs(np.linalg.norm(q[:32]) - np.sqrt(1 - w_prose)) < 1e-3
    q_id = np.asarray(emb.embed_query("where is parse_config_file defined"))
    w_id = 0.25 - emb.adaptive_shift
    assert abs(np.linalg.norm(q_id[:32]) - np.sqrt(1 - w_id)) < 1e-3
    # documents always use the static weight
    docs = emb.embed_documents(["def parse(path):\n    return path\n"])
    assert len(docs[0]) == emb.dim
    d = np.asarray(docs[0])
    assert abs(np.linalg.norm(d[:32]) - np.sqrt(0.75)) < 1e-3
    # adaptive off -> static weight for every query
    emb.adaptive = False
    q_off = np.asarray(emb.embed_query("parse config file"))
    assert abs(np.linalg.norm(q_off[:32]) - np.sqrt(0.75)) < 1e-3


def test_encoder_windowed_long_doc_sees_tail():
    """A long chunk's TAIL content must influence its embedding (windowed
    mean) — prefix truncation made back-half definitions invisible."""
    import numpy as np

    from semcode_tpu.models.encoder import EncoderEmbeddings

    emb = EncoderEmbeddings(preset="mini", max_tokens=32, seed=0)
    filler = "\n".join(f"x{i} = {i}" for i in range(40))
    a = filler + "\ndef very_unique_tail_marker():\n    return 42\n"
    b = filler + "\nzz = 1\n"
    va, vb = (np.asarray(v) for v in emb.embed_documents([a, b]))
    assert not np.allclose(va, vb, atol=1e-5)
    assert abs(np.linalg.norm(va) - 1.0) < 1e-4


def test_hybrid_embed_queries_matches_loop():
    """Batched query embedding must equal a loop over embed_query exactly
    (per-query adaptive weights applied within the batch)."""
    import numpy as np

    from semcode_tpu.embeddings import EmbeddingProviderFactory
    from semcode_tpu.settings import AppSettings

    cfg = AppSettings(
        workspace_root=None,
        embedding_provider="tpu-hybrid",
        embedding_dimension=32,
        encoder_preset="mini",
        embedding_max_tokens=32,
    )
    emb = EmbeddingProviderFactory.create(cfg)
    qs = ["parse config file", "where is parse_config_file defined"]
    batched = np.asarray(emb.embed_queries(qs))
    looped = np.asarray([emb.embed_query(q) for q in qs])
    np.testing.assert_allclose(batched, looped, rtol=1e-5, atol=1e-6)


def test_encoder_query_not_truncated_by_char_estimate(tmp_path):
    """Dense code tokenizes at ~1 token/char-triplet DENSITY far above the
    old len//3 estimate; the encode bucket must come from ACTUAL token
    counts or the query's tail is silently dropped."""
    import numpy as np

    from semcode_tpu.models.encoder import EncoderEmbeddings

    emb = EncoderEmbeddings(
        preset="mini",
        weights_path=tmp_path / "nope",  # force deterministic random init
        max_tokens=512,
        dtype="float32",
    )
    base = "a.b(c,d); " * 55  # ~440 code tokens from 550 chars
    v1 = np.asarray(emb.embed_query(base + "zebra_function_one()"))
    v2 = np.asarray(emb.embed_query(base + "other_thing_two()"))
    # the differing tails are beyond the old 256-token bucket: if they were
    # truncated away the two embeddings would be identical
    assert not np.allclose(v1, v2)
