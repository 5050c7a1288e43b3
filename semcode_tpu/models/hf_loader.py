"""Load pretrained HF BERT-family encoder weights into CodeEncoder params.

Supports the sentence-transformers MiniLM / BERT-base class of checkpoints
(config.json + model.safetensors + tokenizer.json in a local directory — no
network). Maps the HF parameter naming onto the CodeEncoder module tree with
``post_ln=True`` so the computation is BERT-faithful.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from .encoder import EncoderConfig


def _split_heads(w: np.ndarray, heads: int) -> np.ndarray:
    # HF: (hidden, hidden) with output rows = hidden; flax MHA kernel:
    # (in_hidden, heads, head_dim)
    hidden = w.shape[1]
    return w.T.reshape(hidden, heads, hidden // heads)


def load_hf_encoder_params(
    path: Path, base_cfg: EncoderConfig
) -> Tuple[dict, EncoderConfig]:
    cfg_file = path / "config.json"
    hf = json.loads(cfg_file.read_text(encoding="utf-8"))
    cfg = EncoderConfig(
        vocab_size=hf["vocab_size"],
        hidden=hf["hidden_size"],
        layers=hf["num_hidden_layers"],
        heads=hf["num_attention_heads"],
        mlp_dim=hf["intermediate_size"],
        max_len=hf.get("max_position_embeddings", base_cfg.max_len),
        dtype=base_cfg.dtype,
        post_ln=True,
        emb_ln=True,
        type_vocab=hf.get("type_vocab_size", 2),
    )

    weights_file = path / "model.safetensors"
    if weights_file.exists():
        from safetensors.numpy import load_file

        raw = load_file(str(weights_file))
    else:  # pytorch_model.bin fallback via torch (cpu)
        import torch

        raw = {
            k: v.numpy()
            for k, v in torch.load(
                path / "pytorch_model.bin", map_location="cpu", weights_only=True
            ).items()
        }
    raw = {k.removeprefix("bert."): v for k, v in raw.items()}

    def g(name: str) -> np.ndarray:
        return np.asarray(raw[name])

    heads = cfg.heads
    hidden = cfg.hidden
    params: dict = {
        "tok_emb": {"embedding": g("embeddings.word_embeddings.weight")},
        "pos_emb": g("embeddings.position_embeddings.weight"),
        "type_emb": g("embeddings.token_type_embeddings.weight"),
        "emb_ln": {
            "scale": g("embeddings.LayerNorm.weight"),
            "bias": g("embeddings.LayerNorm.bias"),
        },
    }
    for i in range(cfg.layers):
        p = f"encoder.layer.{i}."
        params[f"block_{i}"] = {
            "attn": {
                "query": {
                    "kernel": _split_heads(g(p + "attention.self.query.weight"), heads),
                    "bias": g(p + "attention.self.query.bias").reshape(
                        heads, hidden // heads
                    ),
                },
                "key": {
                    "kernel": _split_heads(g(p + "attention.self.key.weight"), heads),
                    "bias": g(p + "attention.self.key.bias").reshape(
                        heads, hidden // heads
                    ),
                },
                "value": {
                    "kernel": _split_heads(g(p + "attention.self.value.weight"), heads),
                    "bias": g(p + "attention.self.value.bias").reshape(
                        heads, hidden // heads
                    ),
                },
                "out": {
                    "kernel": g(p + "attention.output.dense.weight")
                    .T.reshape(heads, hidden // heads, hidden),
                    "bias": g(p + "attention.output.dense.bias"),
                },
            },
            "ln1": {
                "scale": g(p + "attention.output.LayerNorm.weight"),
                "bias": g(p + "attention.output.LayerNorm.bias"),
            },
            "mlp_in": {
                "kernel": g(p + "intermediate.dense.weight").T,
                "bias": g(p + "intermediate.dense.bias"),
            },
            "mlp_out": {
                "kernel": g(p + "output.dense.weight").T,
                "bias": g(p + "output.dense.bias"),
            },
            "ln2": {
                "scale": g(p + "output.LayerNorm.weight"),
                "bias": g(p + "output.LayerNorm.bias"),
            },
        }
    params = {"params": _to_jnp(params)}
    return params, cfg


def _to_jnp(tree):
    if isinstance(tree, dict):
        return {k: _to_jnp(v) for k, v in tree.items()}
    return jnp.asarray(tree)
