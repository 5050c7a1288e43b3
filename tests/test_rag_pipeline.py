"""RAG pipeline: retrieval plumbing, prompting, fallback behavior."""

import pytest

from semcode_tpu.index.store import SearchHit
from semcode_tpu.rag import SemanticSearchPipeline
from semcode_tpu.settings import AppSettings


class StubEmbeddings:
    def embed_query(self, text):
        return [1.0, 0.0]

    def embed_documents(self, texts):
        return [[1.0, 0.0] for _ in texts]


class StubStore:
    def __init__(self, hits):
        self._hits = hits

    def search(self, vector, top_k=10, filters=None, **kw):
        return self._hits[:top_k]


def _hits(n=3):
    return [
        SearchHit(
            id=f"id{i}",
            score=1.0 - i * 0.1,
            repo="repo",
            path=f"src/file{i}.py",
            language="python",
            text=f"def thing_{i}():\n    return {i}",
        )
        for i in range(n)
    ]


def _pipeline(hits, **cfg_kw):
    cfg = AppSettings(rag_provider="fallback", **cfg_kw)
    return SemanticSearchPipeline(
        config=cfg, vector_store=StubStore(hits), embeddings=StubEmbeddings()
    )


def test_query_returns_sources_and_fallback_answer():
    p = _pipeline(_hits())
    result = p.query("what does thing_0 do?")
    assert result["meta"]["fallback_used"] is True
    assert result["meta"]["reason"] == "no_llm_configured"
    assert len(result["sources"]) == 3
    src = result["sources"][0]
    assert src["path"] == "src/file0.py" and src["score"] == pytest.approx(1.0)
    assert "thing_0" in result["answer"]


def test_empty_retrieval_fallback():
    p = _pipeline([])
    result = p.query("anything")
    assert result["sources"] == []
    assert result["meta"]["reason"] == "no_results"


def test_empty_question_raises():
    p = _pipeline(_hits())
    with pytest.raises(ValueError):
        p.query("   ")


def test_llm_path_and_prompt_rendering(monkeypatch):
    captured = {}

    class FakeLLM:
        def chat(self, system, user):
            captured["system"] = system
            captured["user"] = user
            return "the answer"

    cfg = AppSettings(
        rag_provider="openai",
        rag_prompt_template="SYS={system_prompt} CTX={context} Q={question}",
    )
    p = SemanticSearchPipeline(
        config=cfg, vector_store=StubStore(_hits(2)), embeddings=StubEmbeddings()
    )
    monkeypatch.setattr("semcode_tpu.rag.pipeline.create_llm", lambda c: FakeLLM())
    result = p.query("my question")
    assert result["answer"] == "the answer"
    assert result["meta"]["fallback_used"] is False
    assert "my question" in captured["user"]
    assert "src/file0.py" in captured["user"]
    assert cfg.rag_system_prompt in captured["user"]


def test_llm_failure_falls_back(monkeypatch):
    class BrokenLLM:
        def chat(self, system, user):
            raise RuntimeError("provider down")

    cfg = AppSettings(rag_provider="openai")
    p = SemanticSearchPipeline(
        config=cfg, vector_store=StubStore(_hits(2)), embeddings=StubEmbeddings()
    )
    monkeypatch.setattr("semcode_tpu.rag.pipeline.create_llm", lambda c: BrokenLLM())
    result = p.query("q")
    assert result["meta"]["fallback_used"] is True
    assert "llm_error" in result["meta"]["reason"]
    assert result["sources"]


def test_llm_empty_answer_falls_back(monkeypatch):
    class SilentLLM:
        def chat(self, system, user):
            return "   \n"

    cfg = AppSettings(rag_provider="openai")
    p = SemanticSearchPipeline(
        config=cfg, vector_store=StubStore(_hits(2)), embeddings=StubEmbeddings()
    )
    monkeypatch.setattr("semcode_tpu.rag.pipeline.create_llm", lambda c: SilentLLM())
    result = p.query("q")
    assert result["meta"]["fallback_used"] is True
    assert "empty" in result["meta"]["reason"]
    assert result["answer"].strip()


def test_snippet_truncation():
    hits = [
        SearchHit(
            id="x",
            score=1.0,
            repo="r",
            path="p.py",
            language="python",
            text="z" * 5000,
        )
    ]
    p = _pipeline(hits)
    result = p.query("q")
    assert len(result["sources"][0]["snippet"]) == 1000


def test_query_cache(monkeypatch):
    calls = {"n": 0}

    class CountingStore(StubStore):
        version = 1

        def search(self, vector, top_k=10, filters=None, **kw):
            calls["n"] += 1
            return super().search(vector, top_k=top_k, filters=filters)

    from semcode_tpu.settings import AppSettings

    cfg = AppSettings(rag_provider="fallback", rag_query_cache_size=4)
    store = CountingStore(_hits(2))
    p = SemanticSearchPipeline(
        config=cfg, vector_store=store, embeddings=StubEmbeddings()
    )
    r1 = p.query("same question")
    r2 = p.query("same question")
    assert calls["n"] == 1
    assert r2["meta"].get("cached") is True
    assert r1["answer"] == r2["answer"]
    # a store mutation (version bump) invalidates
    store.version = 2
    p.query("same question")
    assert calls["n"] == 2


def test_transient_failure_results_not_cached():
    # round-1 advisor finding: caching fallback answers caused by transient
    # retrieval/LLM failures poisons the question until the next version bump
    calls = {"n": 0}

    class FlakyStore(StubStore):
        version = 1

        def search(self, vector, top_k=10, filters=None, **kw):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("transient engine hiccup")
            return super().search(vector, top_k=top_k, filters=filters)

    from semcode_tpu.settings import AppSettings

    cfg = AppSettings(rag_provider="fallback", rag_query_cache_size=4)
    p = SemanticSearchPipeline(
        config=cfg, vector_store=FlakyStore(_hits(2)), embeddings=StubEmbeddings()
    )
    r1 = p.query("flaky question")
    assert r1["meta"]["fallback_used"] and not r1["sources"]
    r2 = p.query("flaky question")  # must NOT be served from cache
    assert r2["meta"].get("cached") is None
    assert r2["sources"], "second attempt should succeed and return sources"


def test_llm_constructed_once_and_reused(monkeypatch):
    """provider=tpu-lm loads a full checkpoint in its constructor — the
    pipeline must build the LLM once, not per query / per batch element."""
    calls = {"n": 0}

    class FakeLLM:
        def chat(self, system, user):
            return "answer"

    def create(cfg):
        calls["n"] += 1
        return FakeLLM()

    cfg = AppSettings(rag_provider="openai", rag_query_cache_size=0)
    p = SemanticSearchPipeline(
        config=cfg, vector_store=StubStore(_hits(2)), embeddings=StubEmbeddings()
    )
    monkeypatch.setattr("semcode_tpu.rag.pipeline.create_llm", create)
    for _ in range(3):
        p.query("q?")
    assert calls["n"] == 1


def test_llm_create_failure_not_cached(monkeypatch):
    """A transient constructor failure must retry on the next query (only
    a successful build — or a no-provider None — is cached)."""
    calls = {"n": 0}

    class FakeLLM:
        def chat(self, system, user):
            return "answer"

    def flaky(cfg):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("transient")
        return FakeLLM()

    cfg = AppSettings(rag_provider="openai", rag_query_cache_size=0)
    p = SemanticSearchPipeline(
        config=cfg, vector_store=StubStore(_hits(1)), embeddings=StubEmbeddings()
    )
    monkeypatch.setattr("semcode_tpu.rag.pipeline.create_llm", flaky)
    r1 = p.query("q?")
    assert r1["meta"]["fallback_used"] is True  # failed build -> fallback
    r2 = p.query("q?")
    assert r2["answer"] == "answer" and calls["n"] == 2


def test_query_batch_uses_query_side_embeddings():
    """Batched requests must embed with the QUERY-side path: providers like
    tpu-hybrid weight queries differently than documents, so a micro-batched
    request must rank exactly like the same question sent alone."""

    class RecordingEmbeddings:
        def __init__(self):
            self.calls = []

        def embed_query(self, text):
            self.calls.append(("query", text))
            return [1.0, 0.0]

        def embed_queries(self, texts):
            self.calls.append(("queries", tuple(texts)))
            return [[1.0, 0.0] for _ in texts]

        def embed_documents(self, texts):
            self.calls.append(("documents", tuple(texts)))
            return [[0.0, 1.0] for _ in texts]

    class BatchStore:
        version = 0

        def search(self, vector, top_k=10, filters=None, **kw):
            # SearcherLike protocol surface (typeguard checks the stub
            # against it); query_batch itself routes through search_batch
            return _hits(1)

        def search_batch(self, vectors, top_k=10, filters=None, query_texts=None, **kw):
            return [_hits(1) for _ in range(len(vectors))]

    emb = RecordingEmbeddings()
    cfg = AppSettings(rag_provider="fallback")
    p = SemanticSearchPipeline(
        config=cfg, vector_store=BatchStore(), embeddings=emb
    )
    out = p.query_batch(["q one", "q two"])
    assert len(out) == 2
    kinds = [c[0] for c in emb.calls]
    assert "documents" not in kinds and "queries" in kinds


# -- grounding guard (VERDICT r4 item 4: no invented definitions) ------------


def _guarded_pipeline(answer_text, hits, monkeypatch, **cfg_kw):
    class FabricatingLLM:
        def chat(self, system, user):
            return answer_text

    cfg = AppSettings(rag_provider="openai", **cfg_kw)
    p = SemanticSearchPipeline(
        config=cfg, vector_store=StubStore(hits), embeddings=StubEmbeddings()
    )
    monkeypatch.setattr(
        "semcode_tpu.rag.pipeline.create_llm", lambda c: FabricatingLLM()
    )
    return p


def test_grounding_guard_blocks_invented_symbol(monkeypatch):
    """Retrieval-miss fixture: the retrieved context lacks the asked
    symbol and the LM fabricates a definition anyway — the guard must
    emit the extractive fallback with an honest note, not the invention
    (tools/lm_demo.py row-4 failure class)."""
    p = _guarded_pipeline(
        "`quantize_rows` is defined in src/missing.py (lines 4-9).",
        _hits(3),  # snippets contain thing_0..2, never quantize_rows
        monkeypatch,
    )
    out = p.query("what does quantize_rows do?")
    assert out["meta"]["fallback_used"] is True
    assert out["meta"]["reason"] == "grounding_failed"
    assert out["meta"]["ungrounded_symbol"] == "quantize_rows"
    assert "not supported by the retrieved context" in out["answer"]
    assert "is defined in src/missing.py" not in out["answer"]


def test_grounding_guard_blocks_invented_path(monkeypatch):
    """Symbol present in context but the cited file is not among the
    retrieved hits -> still a grounding failure."""
    p = _guarded_pipeline(
        "`thing_0` is defined in lib/elsewhere.py.", _hits(3), monkeypatch
    )
    out = p.query("where is thing_0 defined?")
    assert out["meta"]["reason"] == "grounding_failed"
    assert out["meta"]["ungrounded_symbol"] == "thing_0"


def test_grounding_guard_passes_supported_claim(monkeypatch):
    """A claim the context supports (symbol in snippet, path among hits)
    flows through untouched — including the trained lines-suffix form."""
    p = _guarded_pipeline(
        "`thing_1` is defined in src/file1.py (lines 1-2). Returns 1.",
        _hits(3),
        monkeypatch,
    )
    out = p.query("where is thing_1 defined?")
    assert out["meta"]["fallback_used"] is False
    assert out["answer"].startswith("`thing_1` is defined in src/file1.py")


def test_grounding_guard_ignores_claimless_answers(monkeypatch):
    p = _guarded_pipeline(
        "The retrieval layer quantizes rows to int8.", _hits(2), monkeypatch
    )
    out = p.query("how are rows stored?")
    assert out["meta"]["fallback_used"] is False


def test_grounding_guard_can_be_disabled(monkeypatch):
    p = _guarded_pipeline(
        "`quantize_rows` is defined in src/missing.py.",
        _hits(2),
        monkeypatch,
        rag_grounding_guard=False,
    )
    out = p.query("what does quantize_rows do?")
    assert out["meta"]["fallback_used"] is False
    assert "quantize_rows" in out["answer"]


def test_grounding_guard_blocks_fabricated_line_span(monkeypatch):
    """Symbol and path grounded but the claimed line span overlaps no
    line-annotated hit at that path -> fabricated precision, blocked."""
    hits = _hits(2)
    hits[0].metadata.update(symbol="thing_0", start_line=10, end_line=40)
    p = _guarded_pipeline(
        "`thing_0` is defined in src/file0.py (lines 900-3000).",
        hits,
        monkeypatch,
    )
    out = p.query("where is thing_0 defined?")
    assert out["meta"]["reason"] == "grounding_failed"

    p2 = _guarded_pipeline(
        "`thing_0` is defined in src/file0.py (lines 12-38).",
        hits,
        monkeypatch,
    )
    out2 = p2.query("where is thing_0 defined again?")
    assert out2["meta"]["fallback_used"] is False
