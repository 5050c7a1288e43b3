"""Flax transformer encoder for on-TPU embedding inference.

BERT-style bidirectional encoder with mean pooling and L2 normalization —
the in-process replacement for the reference's remote embedding providers
(reference src/semcode/embeddings/providers.py:38-100). Chunk and query
embedding is one batched jit step: tokenize on host (static shapes), encode on
TPU in bf16 with f32 layernorms/softmax, pool, normalize.

Presets follow familiar encoder sizes so real pretrained weights (MiniLM /
BERT-base class, HF safetensors layout) can be dropped in via
``settings.encoder_weights_path``; without weights the encoder runs with
deterministic seeded init (useful for shape/perf work and tests — retrieval
quality then comes from the hash provider instead).

TPU notes: hidden sizes are multiples of 128 (MXU lanes), sequence padded to
a static bucket, attention uses plain dot-product (XLA fuses QK^T+softmax+V
fine at these sizes; a Pallas flash-attention kernel is only worth it for
much longer sequences than code chunks).
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Any, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..logger import get_logger
from .tokenizer import load_tokenizer

log = get_logger("models.encoder")


@dataclass(frozen=True)
class EncoderConfig:
    vocab_size: int = 32768
    hidden: int = 384
    layers: int = 6
    heads: int = 12
    mlp_dim: int = 1536
    max_len: int = 512
    dtype: Any = jnp.bfloat16
    # BERT-faithful mode for loading pretrained HF weights: post-layernorm
    # blocks, embedding layernorm, token-type embeddings.
    post_ln: bool = False
    emb_ln: bool = False
    type_vocab: int = 0

    @staticmethod
    def preset(name: str, *, vocab_size: int = 32768, max_len: int = 512,
               dtype: Any = jnp.bfloat16) -> "EncoderConfig":
        table = {
            "mini": dict(hidden=384, layers=6, heads=12, mlp_dim=1536),
            "base": dict(hidden=768, layers=12, heads=12, mlp_dim=3072),
            "large": dict(hidden=1024, layers=24, heads=16, mlp_dim=4096),
        }
        if name not in table:
            raise ValueError(f"unknown encoder preset: {name}")
        return EncoderConfig(
            vocab_size=vocab_size, max_len=max_len, dtype=dtype, **table[name]
        )


class _Block(nn.Module):
    cfg: EncoderConfig

    @nn.compact
    def __call__(self, x, mask):
        cfg = self.cfg
        attn = nn.MultiHeadDotProductAttention(
            num_heads=cfg.heads,
            dtype=cfg.dtype,
            qkv_features=cfg.hidden,
            name="attn",
        )
        mlp_in = nn.Dense(cfg.mlp_dim, dtype=cfg.dtype, name="mlp_in")
        mlp_out = nn.Dense(cfg.hidden, dtype=cfg.dtype, name="mlp_out")
        ln1 = nn.LayerNorm(dtype=jnp.float32, name="ln1")
        ln2 = nn.LayerNorm(dtype=jnp.float32, name="ln2")
        if cfg.post_ln:  # BERT layout (pretrained HF weights)
            x = ln1((x + attn(x, x, mask=mask)).astype(jnp.float32)).astype(
                cfg.dtype
            )
            # HF BERT's "gelu" is the exact erf form, not the tanh approx
            h = mlp_out(nn.gelu(mlp_in(x), approximate=False))
            return ln2((x + h).astype(jnp.float32)).astype(cfg.dtype)
        # pre-LN layout (default: more stable to train from scratch)
        h = ln1(x).astype(cfg.dtype)
        x = x + attn(h, h, mask=mask)
        h = ln2(x).astype(cfg.dtype)
        return x + mlp_out(nn.gelu(mlp_in(h)))


class CodeEncoder(nn.Module):
    """Token ids (B, L) + mask (B, L) -> unit embeddings (B, hidden) f32."""

    cfg: EncoderConfig

    @nn.compact
    def __call__(self, ids, mask):
        cfg = self.cfg
        tok = nn.Embed(cfg.vocab_size, cfg.hidden, dtype=cfg.dtype, name="tok_emb")(
            ids
        )
        pos = self.param(
            "pos_emb",
            nn.initializers.normal(0.02),
            (cfg.max_len, cfg.hidden),
            jnp.float32,
        )
        x = tok + pos[None, : ids.shape[1]].astype(cfg.dtype)
        if cfg.type_vocab:
            type_emb = self.param(
                "type_emb",
                nn.initializers.normal(0.02),
                (cfg.type_vocab, cfg.hidden),
                jnp.float32,
            )
            x = x + type_emb[0][None, None, :].astype(cfg.dtype)
        if cfg.emb_ln:
            x = nn.LayerNorm(dtype=jnp.float32, name="emb_ln")(x).astype(cfg.dtype)
        attn_mask = nn.make_attention_mask(mask, mask, dtype=cfg.dtype)
        for i in range(cfg.layers):
            x = _Block(cfg, name=f"block_{i}")(x, attn_mask)
        if not cfg.post_ln:
            x = nn.LayerNorm(dtype=jnp.float32, name="ln_f")(x)
        # masked mean pooling in f32
        m = mask.astype(jnp.float32)[:, :, None]
        pooled = jnp.sum(x.astype(jnp.float32) * m, axis=1) / jnp.maximum(
            jnp.sum(m, axis=1), 1.0
        )
        norm = jnp.linalg.norm(pooled, axis=1, keepdims=True)
        return pooled / jnp.maximum(norm, 1e-9)


def _len_bucket(n: int, max_len: int) -> int:
    """Static sequence-length buckets to bound recompilation."""
    for b in (64, 128, 256, 512, 1024):
        if n <= b and b <= max_len:
            return b
    return max_len


class EncoderEmbeddings:
    """embed_documents/embed_query provider backed by CodeEncoder on TPU."""

    def __init__(
        self,
        preset: str = "mini",
        *,
        dim: Optional[int] = None,
        weights_path: Optional[Path] = None,
        batch_size: int = 64,
        max_tokens: int = 512,
        dtype: str = "bfloat16",
        seed: int = 0,
    ):
        jdtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}.get(
            dtype, jnp.bfloat16
        )
        if weights_path is None and preset == "mini":
            # shipped default: a pretrained checkpoint packaged with the
            # library (assets/encoder-mini), so provider=tpu-encoder and
            # tpu-hybrid work out of the box with no training step. An
            # explicit weights_path or a non-default preset overrides it.
            shipped = Path(__file__).resolve().parents[1] / "assets" / "encoder-mini"
            if (shipped / "semcode_encoder.msgpack").exists():
                weights_path = shipped
        self.tokenizer = load_tokenizer(weights_path, 32768, max_tokens)
        self.cfg = EncoderConfig.preset(
            preset,
            vocab_size=self.tokenizer.vocab_size,
            max_len=max_tokens,
            dtype=jdtype,
        )
        self.batch_size = int(batch_size)
        self.model = CodeEncoder(self.cfg)
        self.random_init = False  # set True below if no checkpoint is found
        if weights_path is not None and (Path(weights_path)).exists():
            wp = Path(weights_path)
            if (wp / "semcode_encoder.msgpack").exists():
                from .train import load_params

                self.params, self.cfg = load_params(wp)
                # trained checkpoints use the hashing tokenizer vocabulary
                self.model = CodeEncoder(self.cfg)
                log.info("encoder_checkpoint_loaded", path=str(wp))
            else:
                from .hf_loader import load_hf_encoder_params

                self.params, self.cfg = load_hf_encoder_params(wp, self.cfg)
                self.model = CodeEncoder(self.cfg)
                log.info("encoder_weights_loaded", path=str(wp))
        else:
            init_ids = jnp.zeros((1, 8), dtype=jnp.int32)
            init_mask = jnp.ones((1, 8), dtype=jnp.int32)
            self.params = self.model.init(
                jax.random.PRNGKey(seed), init_ids, init_mask
            )
            self.random_init = True
            log.warning(
                "encoder_running_with_RANDOM_weights",
                preset=preset,
                detail=(
                    "provider=tpu-encoder has no checkpoint: embeddings are "
                    "random-init and retrieval quality will be poor. Set "
                    "encoder.weights_path to an HF checkpoint dir or run "
                    "'semcode-tpu train' first; or use provider=tpu-hash."
                ),
            )
        self.dim = self.cfg.hidden
        if dim is not None and dim != self.dim:
            raise ValueError(
                f"embedding_dimension={dim} but the encoder produces "
                f"{self.dim}; set embedding.dimension = {self.dim}"
            )
        self._ckpt_dir = None if self.random_init else Path(weights_path)
        self._apply = jax.jit(self.model.apply)

    @property
    def signature(self) -> str:
        """Vector-definition identity: checkpoint fingerprint + output dim
        (see providers.provider_signature; a retrained/replaced checkpoint
        must invalidate stored vectors on incremental re-ingest)."""
        if self._ckpt_dir is None:
            return f"encoder:random:d{self.dim}"
        import hashlib

        h = hashlib.sha1()
        for f in sorted(self._ckpt_dir.glob("*")):
            if f.is_file():
                h.update(f.name.encode())
                h.update(str(f.stat().st_size).encode())
                with open(f, "rb") as fh:  # first 4 MB: retrained params
                    h.update(fh.read(4 << 20))  # differ from byte ~0
        return f"encoder:{h.hexdigest()[:12]}:d{self.dim}"

    def _encode(self, texts: Sequence[str]) -> np.ndarray:
        # tokenize at FULL max_len first, then crop to the bucket of the
        # longest ACTUAL row: a char-count estimate under-counts dense code
        # (~1 token/char), silently truncating queries the window could hold
        ids, mask = self.tokenizer.encode_batch(texts, max_len=self.cfg.max_len)
        longest = int(mask.sum(axis=1).max()) if len(texts) else 1
        bucket = _len_bucket(longest, self.cfg.max_len)
        ids, mask = ids[:, :bucket], mask[:, :bucket]
        pad = -(-ids.shape[0] // 8) * 8
        if pad != ids.shape[0]:
            ids = np.pad(ids, ((0, pad - ids.shape[0]), (0, 0)))
            mask = np.pad(mask, ((0, pad - mask.shape[0]), (0, 0)))
        # pad small batches to 8, larger to the full batch size: bounds the
        # number of distinct jit shapes (expensive compiles on TPU)
        target = 8 if ids.shape[0] <= 8 else self.batch_size
        if ids.shape[0] < target:
            extra = target - ids.shape[0]
            ids = np.pad(ids, ((0, extra), (0, 0)))
            mask = np.pad(mask, ((0, extra), (0, 0)))
        out = self._apply(self.params, jnp.asarray(ids), jnp.asarray(mask))
        return np.asarray(out, dtype=np.float32)[: len(texts)]

    # windows per document: chunks run up to 200 lines (~1500 code tokens),
    # far beyond one max_len window — a prefix-truncated embedding simply
    # cannot see definitions in the back half of a chunk
    MAX_DOC_WINDOWS = 6

    def _encode_rows(self, rows: Sequence[np.ndarray]) -> np.ndarray:
        """Encode pre-tokenized id rows (no CLS/padding) in one jit step."""
        from .tokenizer import CLS_ID, PAD_ID

        longest = max((len(r) + 1 for r in rows), default=1)
        bucket = _len_bucket(min(longest, self.cfg.max_len), self.cfg.max_len)
        n = len(rows)
        ids = np.full((n, bucket), PAD_ID, dtype=np.int32)
        mask = np.zeros((n, bucket), dtype=np.int32)
        ids[:, 0] = CLS_ID
        mask[:, 0] = 1
        for i, r in enumerate(rows):
            r = r[: bucket - 1]
            ids[i, 1 : 1 + len(r)] = r
            mask[i, 1 : 1 + len(r)] = 1
        target = 8 if n <= 8 else -(-n // 8) * 8
        if n < target:
            ids = np.pad(ids, ((0, target - n), (0, 0)))
            mask = np.pad(mask, ((0, target - n), (0, 0)))
        out = self._apply(self.params, jnp.asarray(ids), jnp.asarray(mask))
        return np.asarray(out, dtype=np.float32)[:n]

    def embed_documents(self, texts: Sequence[str]) -> List[List[float]]:
        """Windowed document embedding: long chunks are split into
        ``max_len``-token windows, each encoded separately, and the document
        vector is the length-weighted mean of its window embeddings
        (re-normalized). A 200-line chunk's later definitions stay visible
        instead of being truncated away."""
        window = self.cfg.max_len - 1
        rows: List[np.ndarray] = []
        owners: List[int] = []
        weights: List[float] = []
        for di, t in enumerate(texts):
            tids = self.tokenizer.encode_ids(
                t, cap=window * self.MAX_DOC_WINDOWS
            )
            n_win = max(1, -(-len(tids) // window))
            for w in range(n_win):
                seg = tids[w * window : (w + 1) * window]
                rows.append(seg)
                owners.append(di)
                weights.append(float(max(len(seg), 1)))
        acc = np.zeros((len(texts), self.dim), dtype=np.float32)
        wsum = np.zeros((len(texts),), dtype=np.float32)
        for i in range(0, len(rows), self.batch_size):
            vecs = self._encode_rows(rows[i : i + self.batch_size])
            for v, o, w in zip(
                vecs,
                owners[i : i + self.batch_size],
                weights[i : i + self.batch_size],
            ):
                acc[o] += w * v
                wsum[o] += w
        acc /= np.maximum(wsum[:, None], 1e-9)
        acc /= np.maximum(
            np.linalg.norm(acc, axis=1, keepdims=True), 1e-9
        )
        return [v.tolist() for v in acc]

    def embed_query(self, text: str) -> List[float]:
        return self._encode([text])[0].tolist()

    def embed_queries(self, texts: Sequence[str]) -> List[List[float]]:
        """Batched query embedding: single-window like embed_query (queries
        are short; the windowed length-weighted mean is a DOC-side scheme)."""
        out: List[List[float]] = []
        for i in range(0, len(texts), self.batch_size):
            vecs = self._encode(list(texts[i : i + self.batch_size]))
            out.extend(v.tolist() for v in vecs)
        return out
