"""Pair construction + encoder checkpoint roundtrip."""

import numpy as np
import pytest

import jax

from semcode_tpu.models.data import PairBatcher
from semcode_tpu.models.encoder import CodeEncoder, EncoderConfig
from semcode_tpu.models.tokenizer import HashingTokenizer
from semcode_tpu.models.train import load_params, save_params

TEXT = "\n".join(f"def f_{i}(): return {i}" for i in range(30))


def test_pair_batcher_shapes():
    tok = HashingTokenizer(max_len=64)
    b = PairBatcher([TEXT] * 5, tok, seq_len=64, batch_size=4)
    batches = list(b.batches(3))
    assert len(batches) == 3
    for batch in batches:
        assert batch["anchor_ids"].shape == (4, 64)
        assert batch["pos_mask"].shape == (4, 64)
        assert batch["anchor_mask"].sum() > 0


def test_pair_batcher_rejects_empty():
    tok = HashingTokenizer(max_len=32)
    with pytest.raises(ValueError):
        PairBatcher(["one line"], tok, seq_len=32)


def test_checkpoint_roundtrip(tmp_path):
    cfg = EncoderConfig(
        vocab_size=256, hidden=128, layers=1, heads=4, mlp_dim=256, max_len=16
    )
    model = CodeEncoder(cfg)
    ids = np.ones((1, 8), dtype=np.int32)
    params = model.init(jax.random.PRNGKey(0), ids, ids)
    save_params(params, cfg, tmp_path / "ckpt")
    params2, cfg2 = load_params(tmp_path / "ckpt")
    assert cfg2.hidden == 128 and cfg2.layers == 1
    out1 = model.apply(params, ids, ids)
    out2 = CodeEncoder(cfg2).apply(params2, ids, ids)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def test_checkpoint_half_precision_roundtrip(tmp_path):
    """half=True ships f16 on disk at ~half the bytes; load restores f32
    and the embedding output matches within f16 quantization error."""
    cfg = EncoderConfig(
        vocab_size=256, hidden=128, layers=1, heads=4, mlp_dim=256, max_len=16
    )
    model = CodeEncoder(cfg)
    ids = np.ones((1, 8), dtype=np.int32)
    params = model.init(jax.random.PRNGKey(0), ids, ids)
    save_params(params, cfg, tmp_path / "full")
    save_params(params, cfg, tmp_path / "half", half=True)
    full_b = (tmp_path / "full" / "semcode_encoder.msgpack").stat().st_size
    half_b = (tmp_path / "half" / "semcode_encoder.msgpack").stat().st_size
    assert half_b < 0.6 * full_b
    params2, _ = load_params(tmp_path / "half")
    leaf = jax.tree_util.tree_leaves(params2)[0]
    assert leaf.dtype == np.float32
    out1 = np.asarray(model.apply(params, ids, ids))
    out2 = np.asarray(model.apply(params2, ids, ids))
    np.testing.assert_allclose(out1, out2, atol=2e-3)


def test_encoder_embeddings_loads_checkpoint(tmp_path):
    from semcode_tpu.models.encoder import EncoderEmbeddings

    tok = HashingTokenizer(max_len=32)
    cfg = EncoderConfig(
        vocab_size=tok.vocab_size, hidden=128, layers=1, heads=4,
        mlp_dim=256, max_len=32,
    )
    model = CodeEncoder(cfg)
    ids = np.ones((1, 8), dtype=np.int32)
    params = model.init(jax.random.PRNGKey(1), ids, ids)
    save_params(params, cfg, tmp_path / "enc")
    emb = EncoderEmbeddings(weights_path=tmp_path / "enc", max_tokens=32)
    assert emb.dim == 128
    v = emb.embed_query("def f(): return 1")
    assert len(v) == 128


def test_same_file_hard_negatives_in_batch():
    """With paths given, a batch contains same-file sibling chunks (hard
    negatives); without them it's plain random sampling."""
    import numpy as np

    from semcode_tpu.models.data import PairBatcher
    from semcode_tpu.models.tokenizer import HashingTokenizer

    texts = [f"def f{i}():\n    a = {i}\n    b = {i}\n    return a+b\n" for i in range(40)]
    paths = [f"file_{i // 4}.py" for i in range(40)]  # 4 chunks per file
    tok = HashingTokenizer(max_len=32)
    b = PairBatcher(
        texts, tok, seq_len=32, batch_size=16, paths=paths, hard_frac=0.5,
        seed=3,
    )
    assert b._by_path and len(b._by_path) == 10
    hits = 0
    for batch_idx, picks in enumerate(b._pick_indices() for _ in range(20)):
        files = [picks[i] // 4 for i in range(len(picks))]
        # at least one pair of same-file chunks in most batches
        if len(set(files)) < len(files):
            hits += 1
    assert hits >= 10, hits
