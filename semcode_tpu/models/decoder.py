"""Causal transformer LM for on-TPU answer synthesis.

GPT-2-family decoder — the in-process replacement for the reference's
llama.cpp chat path (reference src/semcode/rag/pipeline.py:270-296, which
shells GGUF inference out to a native CPU wheel). Here generation runs as two
jit programs on the chip:

- **prefill**: one batched causal forward over the (right-padded, bucketed)
  prompt that returns the last-token logits and a KV cache covering the
  prompt slots;
- **decode**: ``lax.scan`` over ``max_new_tokens`` single-token steps, each
  updating the cache in place via ``dynamic_update_slice`` — no Python loop,
  no dynamic shapes, one compile per (prompt-bucket, max_new) pair.

Unlike the encoder (flax linen), the decoder is written as pure functions
over an explicit params pytree: the KV cache must thread through ``lax.scan``
as carry state, which is natural functionally and awkward with linen's
mutable cache collections.

Architecture is GPT-2-faithful (pre-LN blocks, learned positions, final
layernorm, tied LM head, tanh-gelu) so real HF checkpoints (gpt2 /
distilgpt2 / code-gpt2 classes, config.json + safetensors in a local dir)
drop in via ``load_hf_decoder_params``. Without weights it runs seeded-init
(shape/perf work and tests), exactly like the encoder.

TPU notes: matmuls in bf16 with f32 layernorms/softmax/logits; hidden sizes
in the presets are multiples of 128 (MXU lanes); decode is latency- not
FLOP-bound, so the win over host round-trips is keeping the whole token loop
inside one XLA program.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from functools import partial
from pathlib import Path
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..logger import get_logger

log = get_logger("models.decoder")

# The QA prompt grammar shared by training (train_lm.build_qa_texts) and
# inference (rag/llm.TPULocalChat.chat_structured). A corpus-fitted byte LM
# answers reliably ONLY in the exact format it was trained on — raw
# code-continuation training produces noise under chat prompts (measured:
# 3000 steps, next-token acc 0.96, chat output gibberish). Keep all three
# markers in sync; "###" doubles as the generation stop.
QA_CONTEXT = "### Context\n"
QA_QUESTION = "\n\n### Question\n"
QA_ANSWER = "\n\n### Answer\n"
QA_STOP = "\n###"
# context snippet budget (chars ~ byte tokens), SHARED by training and
# inference: a context longer than what training windows covered leaves
# the answer region untrained (measured: ctx 400 @ seq_len 384 -> the
# answer tail never fit a window -> chat noise at next-token acc 0.97).
# 200 ctx + ~40 question + ~220 answer + markers fits seq_len >= 512.
QA_CTX_CHARS = 200


@dataclass(frozen=True)
class DecoderConfig:
    vocab_size: int = 258  # byte tokenizer default (256 bytes + pad + eos)
    hidden: int = 384
    layers: int = 6
    heads: int = 6  # head_dim 64, GPT-2 convention
    mlp_dim: int = 1536
    max_len: int = 1024
    dtype: Any = jnp.bfloat16

    @staticmethod
    def preset(
        name: str,
        *,
        vocab_size: int = 258,
        max_len: int = 1024,
        dtype: Any = jnp.bfloat16,
    ) -> "DecoderConfig":
        table = {
            "mini": dict(hidden=384, layers=6, heads=6, mlp_dim=1536),
            "base": dict(hidden=768, layers=12, heads=12, mlp_dim=3072),
            "large": dict(hidden=1280, layers=36, heads=20, mlp_dim=5120),
        }
        if name not in table:
            raise ValueError(f"unknown decoder preset: {name}")
        return DecoderConfig(
            vocab_size=vocab_size, max_len=max_len, dtype=dtype, **table[name]
        )


# ---------------------------------------------------------------------------
# params


def init_params(cfg: DecoderConfig, seed: int = 0) -> dict:
    """Seeded GPT-2-shaped init (normal 0.02, zero biases, unit LN scales)."""
    rng = np.random.default_rng(seed)

    def w(*shape):
        return jnp.asarray(
            rng.normal(0.0, 0.02, size=shape).astype(np.float32)
        )

    def zeros(*shape):
        return jnp.zeros(shape, jnp.float32)

    def ones(*shape):
        return jnp.ones(shape, jnp.float32)

    h, m = cfg.hidden, cfg.mlp_dim
    params: dict = {
        "wte": w(cfg.vocab_size, h),
        "wpe": w(cfg.max_len, h),
        "ln_f": {"scale": ones(h), "bias": zeros(h)},
        "blocks": [],
    }
    for _ in range(cfg.layers):
        params["blocks"].append(
            {
                "ln_1": {"scale": ones(h), "bias": zeros(h)},
                "attn": {
                    "c_attn": {"kernel": w(h, 3 * h), "bias": zeros(3 * h)},
                    "c_proj": {"kernel": w(h, h), "bias": zeros(h)},
                },
                "ln_2": {"scale": ones(h), "bias": zeros(h)},
                "mlp": {
                    "c_fc": {"kernel": w(h, m), "bias": zeros(m)},
                    "c_proj": {"kernel": w(m, h), "bias": zeros(h)},
                },
            }
        )
    return params


def load_hf_decoder_params(
    path: Path, dtype: Any = jnp.bfloat16
) -> Tuple[dict, DecoderConfig]:
    """Load a local HF GPT-2-family checkpoint (config.json + safetensors).

    GPT-2's Conv1D stores kernels as (in, out) applied as ``x @ W + b`` —
    the same orientation this module uses, so kernels map without transpose.
    """
    path = Path(path)
    hf = json.loads((path / "config.json").read_text(encoding="utf-8"))
    cfg = DecoderConfig(
        vocab_size=hf["vocab_size"],
        hidden=hf["n_embd"],
        layers=hf["n_layer"],
        heads=hf["n_head"],
        mlp_dim=hf.get("n_inner") or 4 * hf["n_embd"],
        max_len=hf.get("n_positions", 1024),
        dtype=dtype,
    )
    weights_file = path / "model.safetensors"
    if weights_file.exists():
        from safetensors.numpy import load_file

        raw = load_file(str(weights_file))
    else:
        import torch

        raw = {
            k: v.numpy()
            for k, v in torch.load(
                path / "pytorch_model.bin", map_location="cpu",
                weights_only=True,
            ).items()
        }
    raw = {k.removeprefix("transformer."): v for k, v in raw.items()}

    def g(name: str) -> jnp.ndarray:
        return jnp.asarray(np.asarray(raw[name]))

    params: dict = {
        "wte": g("wte.weight"),
        "wpe": g("wpe.weight"),
        "ln_f": {"scale": g("ln_f.weight"), "bias": g("ln_f.bias")},
        "blocks": [],
    }
    for i in range(cfg.layers):
        p = f"h.{i}."
        params["blocks"].append(
            {
                "ln_1": {"scale": g(p + "ln_1.weight"), "bias": g(p + "ln_1.bias")},
                "attn": {
                    "c_attn": {
                        "kernel": g(p + "attn.c_attn.weight"),
                        "bias": g(p + "attn.c_attn.bias"),
                    },
                    "c_proj": {
                        "kernel": g(p + "attn.c_proj.weight"),
                        "bias": g(p + "attn.c_proj.bias"),
                    },
                },
                "ln_2": {"scale": g(p + "ln_2.weight"), "bias": g(p + "ln_2.bias")},
                "mlp": {
                    "c_fc": {
                        "kernel": g(p + "mlp.c_fc.weight"),
                        "bias": g(p + "mlp.c_fc.bias"),
                    },
                    "c_proj": {
                        "kernel": g(p + "mlp.c_proj.weight"),
                        "bias": g(p + "mlp.c_proj.bias"),
                    },
                },
            }
        )
    log.info(
        "decoder_weights_loaded", path=str(path), layers=cfg.layers,
        hidden=cfg.hidden, vocab=cfg.vocab_size,
    )
    return params, cfg


# ---------------------------------------------------------------------------
# forward


def _ln(p, x):
    x = x.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-5) * p["scale"] + p["bias"]


def _dense(p, x):
    return x @ p["kernel"].astype(x.dtype) + p["bias"].astype(x.dtype)


def _split_heads(x, heads):
    b, t, h = x.shape
    return x.reshape(b, t, heads, h // heads)


def _block_prefill(bp, cfg, x, bias_mask):
    """Full causal self-attention over the prompt. Returns (x, k, v)."""
    h = _ln(bp["ln_1"], x).astype(cfg.dtype)
    qkv = _dense(bp["attn"]["c_attn"], h)
    q, k, v = (
        _split_heads(a, cfg.heads) for a in jnp.split(qkv, 3, axis=-1)
    )
    scale = 1.0 / np.sqrt(q.shape[-1])
    # (B, heads, Tq, Tk) scores in f32 for a stable softmax
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    scores = jnp.where(bias_mask[:, None, :, :], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1).astype(cfg.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
    out = out.reshape(x.shape[0], x.shape[1], cfg.hidden)
    x = x + _dense(bp["attn"]["c_proj"], out)
    h = _ln(bp["ln_2"], x).astype(cfg.dtype)
    h = jax.nn.gelu(_dense(bp["mlp"]["c_fc"], h), approximate=True)
    x = x + _dense(bp["mlp"]["c_proj"], h)
    return x, k, v


def _block_decode(bp, cfg, x, k_cache, v_cache, slot_mask, write_idx):
    """Single-token step: q over the cache; writes k/v at ``write_idx``."""
    h = _ln(bp["ln_1"], x).astype(cfg.dtype)  # (B, 1, hidden)
    qkv = _dense(bp["attn"]["c_attn"], h)
    q, k, v = (
        _split_heads(a, cfg.heads) for a in jnp.split(qkv, 3, axis=-1)
    )
    k_cache = jax.lax.dynamic_update_slice(
        k_cache, k.astype(k_cache.dtype), (0, write_idx, 0, 0)
    )
    v_cache = jax.lax.dynamic_update_slice(
        v_cache, v.astype(v_cache.dtype), (0, write_idx, 0, 0)
    )
    scale = 1.0 / np.sqrt(q.shape[-1])
    scores = (
        jnp.einsum("bqhd,bkhd->bhqk", q, k_cache).astype(jnp.float32) * scale
    )
    scores = jnp.where(slot_mask[:, None, None, :], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1).astype(cfg.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v_cache)
    out = out.reshape(x.shape[0], 1, cfg.hidden)
    x = x + _dense(bp["attn"]["c_proj"], out)
    h = _ln(bp["ln_2"], x).astype(cfg.dtype)
    h = jax.nn.gelu(_dense(bp["mlp"]["c_fc"], h), approximate=True)
    x = x + _dense(bp["mlp"]["c_proj"], h)
    return x, k_cache, v_cache


def _logits(params, cfg, x):
    """Tied LM head in f32 (final logits drive sampling; keep them exact)."""
    h = _ln(params["ln_f"], x)
    return h @ params["wte"].astype(jnp.float32).T


def forward_logits(params, cfg: DecoderConfig, ids, mask):
    """Teacher-forced logits (B, T, vocab) — training / parity testing."""
    b, t = ids.shape
    x = (
        params["wte"].astype(cfg.dtype)[ids]
        + params["wpe"].astype(cfg.dtype)[None, :t]
    )
    causal = jnp.tril(jnp.ones((t, t), bool))
    bias_mask = causal[None, :, :] & (mask[:, None, :] > 0)
    for bp in params["blocks"]:
        x, _, _ = _block_prefill(bp, cfg, x, bias_mask)
    return _logits(params, cfg, x)


@partial(jax.jit, static_argnames=("cfg", "max_new", "greedy"))
def generate_tokens(
    params,
    cfg: DecoderConfig,
    ids,
    mask,
    rng,
    *,
    max_new: int,
    greedy: bool = True,
    temperature: float = 1.0,
):
    """Generate ``max_new`` tokens after the prompt. Returns (B, max_new).

    Prompt is right-padded; generated token *t* lands in cache slot
    ``P + t`` with position embedding ``len + t`` (per row), so padding
    between the true prompt end and the bucket edge is simply masked out of
    attention rather than compacted away — static shapes throughout.
    """
    b, p_len = ids.shape
    total = p_len + max_new
    lengths = jnp.sum(mask, axis=1)  # (B,) true prompt lengths

    # ---- prefill ----
    x = (
        params["wte"].astype(cfg.dtype)[ids]
        + params["wpe"].astype(cfg.dtype)[None, :p_len]
    )
    causal = jnp.tril(jnp.ones((p_len, p_len), bool))
    bias_mask = causal[None, :, :] & (mask[:, None, :] > 0)
    head_dim = cfg.hidden // cfg.heads
    k_caches = jnp.zeros((cfg.layers, b, total, cfg.heads, head_dim), cfg.dtype)
    v_caches = jnp.zeros_like(k_caches)
    for li, bp in enumerate(params["blocks"]):
        x, k, v = _block_prefill(bp, cfg, x, bias_mask)
        k_caches = k_caches.at[li, :, :p_len].set(k.astype(cfg.dtype))
        v_caches = v_caches.at[li, :, :p_len].set(v.astype(cfg.dtype))
    last = jnp.take_along_axis(
        x, (lengths - 1)[:, None, None].astype(jnp.int32), axis=1
    )  # (B, 1, hidden) hidden state at the final real prompt token
    logits0 = _logits(params, cfg, last)[:, 0]
    slot_mask0 = jnp.pad(mask > 0, ((0, 0), (0, max_new)))

    def sample(logits, key):
        if greedy:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return jax.random.categorical(
            key, logits / jnp.maximum(temperature, 1e-4), axis=-1
        ).astype(jnp.int32)

    rng, key0 = jax.random.split(rng)
    tok0 = sample(logits0, key0)

    def step(carry, t):
        k_caches, v_caches, slot_mask, tok, rng = carry
        write_idx = p_len + t
        pos = lengths + t  # (B,)
        slot_mask = slot_mask.at[:, write_idx].set(True)
        x = (
            params["wte"].astype(cfg.dtype)[tok][:, None]
            + params["wpe"].astype(cfg.dtype)[pos][:, None]
        )
        new_k, new_v = [], []
        for li, bp in enumerate(params["blocks"]):
            x, kc, vc = _block_decode(
                bp, cfg, x, k_caches[li], v_caches[li], slot_mask, write_idx
            )
            new_k.append(kc)
            new_v.append(vc)
        k_caches = jnp.stack(new_k)
        v_caches = jnp.stack(new_v)
        logits = _logits(params, cfg, x)[:, 0]
        rng, key = jax.random.split(rng)
        nxt = sample(logits, key)
        return (k_caches, v_caches, slot_mask, nxt, rng), tok

    carry = (k_caches, v_caches, slot_mask0, tok0, rng)
    if max_new > 1:
        carry, toks = jax.lax.scan(
            step, carry, jnp.arange(max_new - 1, dtype=jnp.int32)
        )
        toks = jnp.concatenate([toks.T, carry[3][:, None]], axis=1)
    else:
        toks = tok0[:, None]
    return toks


def prompt_bucket(n: int, max_len: int) -> int:
    """Static prompt-length buckets to bound recompilation."""
    for b in (128, 256, 512, 1024, 2048):
        if n <= b and b <= max_len:
            return b
    return max_len


class CodeDecoderLM:
    """Host-side wrapper: text in, text out, static-shape discipline inside."""

    def __init__(
        self,
        preset: str = "mini",
        *,
        weights_path: Optional[Path] = None,
        max_len: int = 1024,
        dtype: str = "bfloat16",
        seed: int = 0,
    ):
        from .tokenizer import load_lm_tokenizer

        jdtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}.get(
            dtype, jnp.bfloat16
        )
        self.tokenizer = load_lm_tokenizer(weights_path, max_len)
        self.random_init = False
        if weights_path is not None and Path(weights_path).exists():
            wp = Path(weights_path)
            if (wp / "semcode_lm.msgpack").exists():
                from .train_lm import load_lm_params

                # trained checkpoints (semcode-tpu train-lm) use the byte
                # tokenizer, which load_lm_tokenizer already selected
                self.params, self.cfg = load_lm_params(wp, dtype=jdtype)
                log.info("decoder_checkpoint_loaded", path=str(wp))
            else:
                self.params, self.cfg = load_hf_decoder_params(wp, dtype=jdtype)
        else:
            self.cfg = DecoderConfig.preset(
                preset,
                vocab_size=self.tokenizer.vocab_size,
                max_len=max_len,
                dtype=jdtype,
            )
            self.params = init_params(self.cfg, seed=seed)
            self.random_init = True
            log.warning(
                "decoder_running_with_RANDOM_weights",
                preset=preset,
                detail=(
                    "provider=tpu-lm has no checkpoint: generated answers "
                    "will be noise. Set rag.weights_path to a local HF "
                    "GPT-2-family checkpoint dir, or use the extractive "
                    "fallback (provider=fallback)."
                ),
            )

    def generate(
        self,
        prompt: str,
        *,
        max_new_tokens: int = 128,
        temperature: float = 0.0,
        seed: int = 0,
    ) -> str:
        ids = self.tokenizer.encode(prompt)
        # clamp: max_new_tokens >= max_len (a raw settings knob) would make
        # the prompt budget zero/negative — zero-width prompt arrays and a
        # wrong-end slice. Always leave at least 16 prompt tokens.
        max_new_tokens = max(1, min(int(max_new_tokens), self.cfg.max_len - 16))
        budget = self.cfg.max_len - max_new_tokens
        if len(ids) > budget:
            ids = ids[-budget:]  # keep the tail: question + nearest context
        bucket = prompt_bucket(len(ids), budget)
        arr = np.zeros((1, bucket), dtype=np.int32)
        msk = np.zeros((1, bucket), dtype=np.int32)
        arr[0, : len(ids)] = ids
        msk[0, : len(ids)] = 1
        toks = generate_tokens(
            self.params,
            self.cfg,
            jnp.asarray(arr),
            jnp.asarray(msk),
            jax.random.PRNGKey(seed),
            max_new=int(max_new_tokens),
            greedy=temperature <= 0.0,
            temperature=float(max(temperature, 1e-4)),
        )
        return self.tokenizer.decode(np.asarray(toks)[0].tolist())
