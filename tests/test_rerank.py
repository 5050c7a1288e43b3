"""Second-stage lexical rerank (index/rerank.py): tokenization, BM25
window scoring with field boosts, blend behavior, and the VectorStore
query_texts plumbing. The reference has no rerank stage at all (Milvus
scores are final — reference src/semcode/storage/milvus_store.py:135-148);
this is a quality feature the TPU build adds."""

import numpy as np

from semcode_tpu.embeddings.providers import EmbeddingPayload
from semcode_tpu.index.rerank import rerank_hits, tokenize
from semcode_tpu.index.store import SearchHit, VectorStore
from semcode_tpu.settings import AppSettings


def _hit(hid, score, text, symbol=None, path=None):
    return SearchHit(
        id=hid,
        score=score,
        text=text,
        path=path,
        metadata={"symbol": symbol} if symbol else {},
    )


def test_tokenize_splits_identifiers():
    toks = tokenize("class ClientSession: def _request_timeout(self)")
    assert "clientsession" in toks  # whole identifier
    assert "client" in toks and "session" in toks  # camelCase subwords
    assert "request" in toks and "timeout" in toks  # snake_case subwords


def test_tokenize_limit():
    toks = tokenize("alpha beta gamma delta", limit=2)
    assert len(toks) == 2


def test_symbol_match_wins_over_dense_order():
    hits = [
        _hit("a", 0.9, "def handle_request(x): return x"),
        _hit("b", 0.85, "class Unrelated: pass"),
        _hit("c", 0.8, "def parse_config_file(path): ...",
             symbol="parse_config_file", path="src/config_loader.py"),
    ]
    out = rerank_hits(
        "where is parse_config_file defined", hits, 3, weight=0.5
    )
    assert out[0].id == "c"


def test_weight_zero_keeps_dense_order():
    hits = [_hit("a", 0.9, "zzz"), _hit("b", 0.8, "match match match")]
    out = rerank_hits("match", hits, 2, weight=0.0)
    assert [h.id for h in out] == ["a", "b"]


def test_no_query_tokens_keeps_dense_order():
    hits = [_hit("a", 0.9, "alpha"), _hit("b", 0.8, "beta")]
    out = rerank_hits("!!! ???", hits, 2, weight=0.5)
    assert [h.id for h in out] == ["a", "b"]


def test_truncates_to_top_k():
    hits = [_hit(str(i), 1.0 - i * 0.01, f"text {i}") for i in range(10)]
    out = rerank_hits("text", hits, 3, weight=0.3)
    assert len(out) == 3


def test_docstring_words_rerank():
    # Query words appear verbatim in the target's docstring: lexical stage
    # must pull it above a dense-preferred distractor.
    hits = [
        _hit("distract", 0.95, "def close(): pass"),
        _hit("target", 0.90,
             '"""Retry the connection after a transient network failure."""\n'
             "def reconnect(): ..."),
    ]
    out = rerank_hits(
        "retry the connection after a transient network failure",
        hits, 2, weight=0.5,
    )
    assert out[0].id == "target"


def _mk_store(tmp_path, mesh8, texts, symbols, vecs, weight=0.5):
    cfg = AppSettings(
        workspace_root=tmp_path,
        embedding_dimension=vecs.shape[1],
        index_kind="flat",
        index_dtype="float32",
        index_metric="ip",
        search_rerank_weight=weight,
    )
    store = VectorStore(cfg, mesh=mesh8)
    store.upsert_embeddings(
        [
            EmbeddingPayload(
                id=f"c{i}",
                text=texts[i],
                vector=vecs[i],
                metadata={
                    "repo": "r",
                    "path": f"f{i}.py",
                    "language": "python",
                    "symbol": symbols[i],
                    "text": texts[i],
                },
            )
            for i in range(len(texts))
        ]
    )
    return store


def test_store_query_texts_rerank(tmp_path, mesh8, rng):
    # 3 docs; dense vectors make doc0 the best match for the query vector,
    # but the query TEXT names doc2's symbol -> rerank flips the order.
    dim = 32
    vecs = rng.standard_normal((3, dim)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    texts = ["def alpha(): pass", "def beta(): pass",
             "def gamma_handler(evt): return evt"]
    store = _mk_store(
        tmp_path, mesh8, texts, ["alpha", "beta", "gamma_handler"], vecs
    )
    q = vecs[0] + 0.01 * vecs[2]  # dense prefers doc0
    plain = store.search(q, top_k=3)
    assert plain[0].id == "c0"
    rr = store.search(q, top_k=1, query_text="where is gamma_handler defined")
    assert rr[0].id == "c2"  # found OUTSIDE dense top_k via the window


def test_store_without_query_text_unchanged(tmp_path, mesh8, rng):
    dim = 32
    vecs = rng.standard_normal((4, dim)).astype(np.float32)
    store = _mk_store(
        tmp_path, mesh8,
        [f"text {i}" for i in range(4)], [None] * 4, vecs,
    )
    hits = store.search_batch(vecs[:2], top_k=2)
    assert hits[0][0].id == "c0" and hits[1][0].id == "c1"


def test_tf_cache_is_content_keyed():
    # same id + same length, different content: the prefix-hash key must
    # miss, so the stale tf map is not served for re-ingested chunks
    a1 = _hit("x", 1.0, "alpha")
    out1 = rerank_hits("alpha", [a1, _hit("y", 0.99, "zzzzz")], 2, weight=0.8)
    assert out1[0].id == "x"
    a2 = _hit("x", 0.99, "gamma")  # re-ingested: same id, new text
    out2 = rerank_hits("gamma", [_hit("y", 1.0, "zzzzz"), a2], 2, weight=0.8)
    assert out2[0].id == "x"


def test_device_path_filter_not_resurrected(tmp_path, mesh8, rng):
    # Regression: search_batch_device must scrub sentinel-scored (tag-
    # masked) slots BEFORE the host rescore — otherwise the rescore
    # overwrites the filter sentinel with the row's true score and rows
    # from the filtered-OUT repo leak into (and outrank) the results.
    # The 10x rerank window makes the over-fetch reach far past the
    # allowed repo's row count, so every masked slot is in the window.
    import jax.numpy as jnp

    dim = 32
    vecs = rng.standard_normal((48, dim)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    cfg = AppSettings(
        workspace_root=tmp_path,
        embedding_dimension=dim,
        index_kind="flat",
        index_dtype="int8",  # host rescore active (no device mirror on cpu)
        index_metric="ip",
        search_rerank_weight=0.5,
    )
    store = VectorStore(cfg, mesh=mesh8)
    store.upsert_embeddings(
        [
            EmbeddingPayload(
                id=f"c{i}",
                text=f"def fn_{i}(): pass",
                vector=vecs[i],
                metadata={
                    "repo": "big" if i < 40 else "small",
                    "path": f"f{i}.py",
                    "language": "python",
                    "text": f"def fn_{i}(): pass",
                },
            )
            for i in range(48)
        ]
    )
    q = jnp.asarray(np.tile(vecs[:1], (8, 1)))  # padded device batch
    hits = store.search_batch_device(
        q, top_k=10, filters={"repo": "small"},
        query_texts=["where is fn_40 defined"],
    )
    assert len(hits) == 8  # one-list-per-query contract preserved
    assert hits[0], "filtered search returned nothing"
    assert all(h.repo == "small" for h in hits[0])
    assert hits[0][0].id == "c40"  # rerank finds the named symbol
