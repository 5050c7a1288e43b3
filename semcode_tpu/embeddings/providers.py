"""Embedding provider factory.

Config-driven factory returning a duck-typed provider exposing
``embed_documents(texts) -> List[List[float]]`` and
``embed_query(text) -> List[float]`` — the same protocol the reference relies
on from LangChain (reference src/semcode/embeddings/providers.py:31-104, used
at services/indexer.py:150 and rag/pipeline.py:171-175).

Providers:
- ``tpu-hash``     deterministic hashed n-gram + TPU random projection (default)
- ``tpu-encoder``  Flax transformer encoder on TPU (optionally HF weights)
- ``openai`` / ``lmstudio``  OpenAI-compatible /v1/embeddings over HTTP
- ``jina``         Jina embeddings API over HTTP
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence

from ..settings import AppSettings, settings as default_settings


@dataclass
class EmbeddingPayload:
    """One chunk ready for upsert (reference providers.py:21-28)."""

    id: str
    text: str
    vector: Sequence[float]
    metadata: Dict[str, Any] = field(default_factory=dict)


class _OpenAICompatibleEmbeddings:
    """Minimal OpenAI-compatible /v1/embeddings client (httpx, no LangChain)."""

    def __init__(
        self,
        model: str,
        api_base: Optional[str],
        api_key: Optional[str],
        batch_size: int = 64,
        timeout: float = 60.0,
    ):
        self.model = model
        self.api_base = (api_base or "https://api.openai.com/v1").rstrip("/")
        self.api_key = api_key or os.getenv("OPENAI_API_KEY")
        self.batch_size = batch_size
        self.timeout = timeout

    def _post(self, texts: Sequence[str]) -> List[List[float]]:
        import httpx

        headers = {"Content-Type": "application/json"}
        if self.api_key:
            headers["Authorization"] = f"Bearer {self.api_key}"
        resp = httpx.post(
            f"{self.api_base}/embeddings",
            json={"model": self.model, "input": list(texts)},
            headers=headers,
            timeout=self.timeout,
        )
        resp.raise_for_status()
        data = resp.json()["data"]
        return [d["embedding"] for d in sorted(data, key=lambda d: d["index"])]

    def embed_documents(self, texts: Sequence[str]) -> List[List[float]]:
        out: List[List[float]] = []
        for i in range(0, len(texts), self.batch_size):
            out.extend(self._post(texts[i : i + self.batch_size]))
        return out

    def embed_query(self, text: str) -> List[float]:
        return self._post([text])[0]


class _JinaEmbeddings(_OpenAICompatibleEmbeddings):
    def __init__(self, model: str, api_key: Optional[str], batch_size: int = 64):
        super().__init__(
            model,
            api_base="https://api.jina.ai/v1",
            api_key=api_key or os.getenv("JINA_API_KEY"),
            batch_size=batch_size,
        )


class HybridEmbeddings:
    """Lexical + semantic ensemble: concatenation of the hash embedder's and
    the trained encoder's unit vectors, each scaled so inner products add as
    a fixed-weight score mix (``w*enc_sim + (1-w)*hash_sim``).

    Held-out measurements motivated this: the hash embedder wins docstring
    queries with literal-identifier overlap while the trained encoder wins
    paraphrase/symbol queries; the concat keeps both signals in one index.
    Both parts are unit vectors, so the concat's norm is constant
    (sqrt(a^2+b^2) = 1) and the weighting survives normalization.
    """

    def __init__(self, hash_emb, encoder_emb, *, w_encoder: float = 0.5):
        import numpy as np

        w = min(max(float(w_encoder), 0.0), 1.0)
        self._a = float(np.sqrt(1.0 - w))  # hash part scale
        self._b = float(np.sqrt(w))  # encoder part scale
        self.hash = hash_emb
        self.encoder = encoder_emb
        self.dim = int(hash_emb.dim) + int(encoder_emb.dim)

    def _concat(self, h, e):
        import numpy as np

        h = np.asarray(h, dtype=np.float32) * self._a
        e = np.asarray(e, dtype=np.float32) * self._b
        return np.concatenate([h, e], axis=-1)

    def embed_documents(self, texts):
        h = self.hash.embed_documents(texts)
        e = self.encoder.embed_documents(texts)
        return [v.tolist() for v in self._concat(h, e)]

    def embed_query(self, text: str):
        return self._concat(
            self.hash.embed_query(text), self.encoder.embed_query(text)
        ).tolist()


class EmbeddingProviderFactory:
    """Create an embeddings provider from settings
    (reference providers.py:31-104 keeps the same shape)."""

    @staticmethod
    def create(config: Optional[AppSettings] = None):
        config = config or default_settings
        provider = config.embedding_provider.lower()
        if provider in ("tpu-hash", "hash", "local"):
            from .hash_embedder import HashEmbeddings

            return HashEmbeddings(
                dim=config.embedding_dimension,
                batch_size=config.embedding_batch_size,
            )
        if provider in ("tpu-encoder", "encoder"):
            from ..models.encoder import EncoderEmbeddings

            return EncoderEmbeddings(
                preset=config.encoder_preset,
                dim=config.embedding_dimension,
                weights_path=config.encoder_weights_path,
                batch_size=config.embedding_batch_size,
                max_tokens=config.embedding_max_tokens,
                dtype=config.encoder_dtype,
            )
        if provider in ("tpu-hybrid", "hybrid"):
            from ..models.encoder import EncoderEmbeddings
            from .hash_embedder import HashEmbeddings

            return HybridEmbeddings(
                HashEmbeddings(
                    dim=config.embedding_dimension,
                    batch_size=config.embedding_batch_size,
                ),
                EncoderEmbeddings(
                    preset=config.encoder_preset,
                    weights_path=config.encoder_weights_path,
                    batch_size=config.embedding_batch_size,
                    max_tokens=config.embedding_max_tokens,
                    dtype=config.encoder_dtype,
                ),
                w_encoder=config.embedding_hybrid_weight,
            )
        if provider in ("openai", "lmstudio"):
            return _OpenAICompatibleEmbeddings(
                model=config.embedding_model,
                api_base=config.embedding_api_base,
                api_key=config.embedding_api_key,
                batch_size=config.embedding_batch_size,
            )
        if provider == "jina":
            return _JinaEmbeddings(
                model=config.embedding_model,
                api_key=config.embedding_api_key,
                batch_size=config.embedding_batch_size,
            )
        raise NotImplementedError(
            f"Embedding provider '{config.embedding_provider}' is not supported"
        )
