"""HF BERT weight loading: load a tiny generated safetensors checkpoint and
compare CodeEncoder's forward against an independent numpy BERT reference.

Covers models/hf_loader.py end to end (config parsing, head splitting,
post-LN/emb-LN layout, exact-erf gelu) with random weights — no network,
no real checkpoint needed (VERDICT round-1 item 8).
"""

import json

import numpy as np
import pytest

import jax.numpy as jnp

from semcode_tpu.models.encoder import CodeEncoder, EncoderConfig
from semcode_tpu.models.hf_loader import load_hf_encoder_params

HIDDEN, HEADS, LAYERS, MLP, VOCAB, MAXPOS, L = 32, 4, 2, 64, 50, 16, 10


def _make_checkpoint(tmp_path, rng):
    cfg = {
        "vocab_size": VOCAB,
        "hidden_size": HIDDEN,
        "num_hidden_layers": LAYERS,
        "num_attention_heads": HEADS,
        "intermediate_size": MLP,
        "max_position_embeddings": MAXPOS,
        "type_vocab_size": 2,
    }
    (tmp_path / "config.json").write_text(json.dumps(cfg))

    def w(*shape, scale=0.08):
        return (scale * rng.standard_normal(shape)).astype(np.float32)

    raw = {
        "embeddings.word_embeddings.weight": w(VOCAB, HIDDEN),
        "embeddings.position_embeddings.weight": w(MAXPOS, HIDDEN),
        "embeddings.token_type_embeddings.weight": w(2, HIDDEN),
        "embeddings.LayerNorm.weight": 1.0 + w(HIDDEN, scale=0.02),
        "embeddings.LayerNorm.bias": w(HIDDEN, scale=0.02),
    }
    for i in range(LAYERS):
        p = f"encoder.layer.{i}."
        raw.update(
            {
                p + "attention.self.query.weight": w(HIDDEN, HIDDEN),
                p + "attention.self.query.bias": w(HIDDEN),
                p + "attention.self.key.weight": w(HIDDEN, HIDDEN),
                p + "attention.self.key.bias": w(HIDDEN),
                p + "attention.self.value.weight": w(HIDDEN, HIDDEN),
                p + "attention.self.value.bias": w(HIDDEN),
                p + "attention.output.dense.weight": w(HIDDEN, HIDDEN),
                p + "attention.output.dense.bias": w(HIDDEN),
                p + "attention.output.LayerNorm.weight": 1.0 + w(HIDDEN, scale=0.02),
                p + "attention.output.LayerNorm.bias": w(HIDDEN, scale=0.02),
                p + "intermediate.dense.weight": w(MLP, HIDDEN),
                p + "intermediate.dense.bias": w(MLP),
                p + "output.dense.weight": w(HIDDEN, MLP),
                p + "output.dense.bias": w(HIDDEN),
                p + "output.LayerNorm.weight": 1.0 + w(HIDDEN, scale=0.02),
                p + "output.LayerNorm.bias": w(HIDDEN, scale=0.02),
            }
        )
    from safetensors.numpy import save_file

    save_file(raw, str(tmp_path / "model.safetensors"))
    return raw


# --- independent numpy BERT (HF semantics: y = x @ W.T + b, post-LN,
# exact erf gelu, 1/sqrt(head_dim) attention scaling) -----------------------

def _ln(x, g, b, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * g + b


def _gelu_erf(x):
    from scipy.special import erf

    return 0.5 * x * (1.0 + erf(x / np.sqrt(2.0)))


def _softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def _numpy_bert(raw, ids, mask):
    g = lambda k: raw[k]
    x = (
        g("embeddings.word_embeddings.weight")[ids]
        + g("embeddings.position_embeddings.weight")[None, : ids.shape[1]]
        + g("embeddings.token_type_embeddings.weight")[0][None, None]
    )
    x = _ln(x, g("embeddings.LayerNorm.weight"), g("embeddings.LayerNorm.bias"))
    hd = HIDDEN // HEADS
    neg = -1e9 * (1.0 - mask[:, None, None, :].astype(np.float32))
    for i in range(LAYERS):
        p = f"encoder.layer.{i}."

        def dense(name, v):
            return v @ g(p + name + ".weight").T + g(p + name + ".bias")

        B, Lq, _ = x.shape
        q = dense("attention.self.query", x).reshape(B, Lq, HEADS, hd)
        k = dense("attention.self.key", x).reshape(B, Lq, HEADS, hd)
        v = dense("attention.self.value", x).reshape(B, Lq, HEADS, hd)
        scores = np.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
        probs = _softmax(scores + neg)
        ctx = np.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, Lq, HIDDEN)
        attn_out = dense("attention.output.dense", ctx)
        x = _ln(
            x + attn_out,
            g(p + "attention.output.LayerNorm.weight"),
            g(p + "attention.output.LayerNorm.bias"),
        )
        h = _gelu_erf(dense("intermediate.dense", x))
        h = h @ g(p + "output.dense.weight").T + g(p + "output.dense.bias")
        x = _ln(
            x + h,
            g(p + "output.LayerNorm.weight"),
            g(p + "output.LayerNorm.bias"),
        )
    m = mask.astype(np.float32)[:, :, None]
    pooled = (x * m).sum(1) / np.maximum(m.sum(1), 1.0)
    return pooled / np.maximum(np.linalg.norm(pooled, axis=1, keepdims=True), 1e-9)


def test_hf_loader_forward_matches_numpy_bert(tmp_path, rng):
    raw = _make_checkpoint(tmp_path, rng)
    base = EncoderConfig(dtype=jnp.float32)
    params, cfg = load_hf_encoder_params(tmp_path, base)
    assert cfg.post_ln and cfg.emb_ln and cfg.type_vocab == 2
    assert cfg.hidden == HIDDEN and cfg.layers == LAYERS and cfg.heads == HEADS

    ids = rng.integers(0, VOCAB, (3, L)).astype(np.int32)
    mask = np.ones((3, L), dtype=np.int32)
    mask[1, 6:] = 0  # ragged batch exercises the attention mask path
    mask[2, 4:] = 0
    model = CodeEncoder(cfg)
    got = np.asarray(model.apply(params, jnp.asarray(ids), jnp.asarray(mask)))
    want = _numpy_bert(raw, ids, mask)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_hf_loader_rejects_missing_config(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_hf_encoder_params(tmp_path, EncoderConfig())
