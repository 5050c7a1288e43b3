"""Deterministic on-TPU hashed n-gram embedder.

The default offline embedding provider: no trained weights, no network. Texts
are tokenized code-aware on the host (identifier splitting, camelCase /
snake_case decomposition), token uni+bigrams are feature-hashed into a large
bucket space, and the TPU turns the sparse bag into a dense unit vector by
gathering rows of a fixed PRNG projection matrix and weighted-summing them —
a random projection of a TF-weighted lexical vector, so cosine similarity
approximates lexical/structural overlap. One batched jit step per
``embed_documents`` call.

This replaces the reference's remote embedding providers for fully-offline
operation (reference src/semcode/embeddings/providers.py delegates to
OpenAI/Jina HTTP or a llama.cpp wheel); the trained-transformer path lives in
``semcode_tpu.models.encoder``.
"""

from __future__ import annotations

import re
import zlib
from functools import partial
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

_TOKEN_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*|\d+|[^\sA-Za-z0-9_]")
_CAMEL_RE = re.compile(
    r"[A-Z]+(?=[A-Z][a-z])|[A-Z]?[a-z]+|[A-Z]+|\d+"
)


def code_tokens(text: str) -> List[str]:
    """Code-aware tokenization: identifiers split on camelCase/snake_case."""
    out: List[str] = []
    for tok in _TOKEN_RE.findall(text):
        if "_" in tok:
            parts = [p for p in tok.split("_") if p]
        elif tok.isalnum() and not tok.isdigit():
            parts = _CAMEL_RE.findall(tok)
        else:
            parts = [tok]
        for p in parts:
            out.append(p.lower())
    return out


def _bucket(feature: str, n_buckets: int) -> int:
    return zlib.crc32(feature.encode("utf-8")) % n_buckets


def _sign(feature: str) -> float:
    return 1.0 if (zlib.crc32(feature.encode("utf-8")) >> 31) & 1 == 0 else -1.0


# Ubiquitous tokens carry no retrieval signal but dominate raw term
# frequency (a docstring query's "the/return/value" tokens would outweigh
# its one distinctive identifier). A corpus-level IDF is impossible in a
# stateless provider, so this fixed approximation downweights (a) english
# glue, (b) language keywords, (c) code nouns so generic they appear in
# most chunks. Held-out MRR motivated the factor (see docs/BENCHMARKS.md).
# The list is part of the embedding definition: changing it invalidates
# stored vectors, and the native featurizer (native/featurizer.cpp)
# mirrors it byte-for-byte — keep both in sync.
STOP_FACTOR = 0.3
# bump whenever the featurization changes meaning (tokens, weighting,
# stop list, projection): v2 = round-3 stop-token downweighting. Part of
# the provider signature, so stored vectors from another version are
# detected as stale on re-ingest instead of being silently mixed.
FEATURIZER_VERSION = 2
STOP_TOKENS = frozenset(
    """the a an of to and or in on for is are was be as at by with from
    this that it if else elif return def class import none true false
    self cls not no new del try except finally raise pass while do
    switch case break continue static void const let var function
    public private protected virtual override template typename using
    namespace struct enum union extern inline operator sizeof nullptr
    null undefined type types value values arg args kwargs param params
    parameter parameters obj object data result results name names key
    keys item items list dict str int float bool double long short
    unsigned char auto index val num count size len length get set add
    when then than must should which where there these those such other
    into over only also each all any some more most can cannot may
    might will would use used uses using given default optional
    returns true false same both two one first last next see note""".split()
)


def _stopped(feature: str) -> bool:
    """Is this feature a low-signal unigram? Bigrams keep full weight
    (two glue words in sequence are often a meaningful phrase), as do
    identifiers; single punctuation marks and bare digits are noise."""
    if "\x1f" in feature:
        return False
    if feature in STOP_TOKENS:
        return True
    return len(feature) == 1 and not feature.isalnum() or feature.isdigit()


class HashEmbeddings:
    """embed_documents/embed_query via hashed n-grams + TPU random projection."""

    def __init__(
        self,
        dim: int = 384,
        *,
        n_buckets: int = 1 << 16,
        max_features: int = 256,
        seed: int = 7,
        batch_size: int = 256,
        use_native: bool = True,
    ):
        self.dim = int(dim)
        self.n_buckets = int(n_buckets)
        self.max_features = int(max_features)
        self.batch_size = int(batch_size)
        self.use_native = use_native
        self.seed = int(seed)
        # fixed projection matrix, generated on device once (never trained)
        key = jax.random.PRNGKey(seed)
        self._proj = jax.random.normal(
            key, (self.n_buckets, self.dim), dtype=jnp.bfloat16
        ) * np.float32(1.0 / np.sqrt(self.dim))

    @property
    def signature(self) -> str:
        return (
            f"hash-v{FEATURIZER_VERSION}:d{self.dim}"
            f":b{self.n_buckets}:f{self.max_features}:s{self.seed}"
        )

    # -- host featurization ----------------------------------------------------

    def _featurize(self, text: str):
        toks = code_tokens(text)[:2048]
        counts: dict = {}
        for t in toks:
            counts[t] = counts.get(t, 0) + 1
        for a, b in zip(toks, toks[1:]):
            bg = f"{a}\x1f{b}"
            counts[bg] = counts.get(bg, 0) + 1
        feats = sorted(counts.items(), key=lambda kv: -kv[1])[: self.max_features]
        ids = np.zeros(self.max_features, dtype=np.int32)
        wts = np.zeros(self.max_features, dtype=np.float32)
        for i, (f, c) in enumerate(feats):
            ids[i] = _bucket(f, self.n_buckets)
            w = (1.0 + np.log(c)) * _sign(f)
            if _stopped(f):
                w *= STOP_FACTOR
            wts[i] = w
        return ids, wts

    # -- device projection -------------------------------------------------------

    def _embed_batch(self, ids: np.ndarray, wts: np.ndarray) -> np.ndarray:
        out = _project(self._proj, jnp.asarray(ids), jnp.asarray(wts))
        return np.asarray(out, dtype=np.float32)

    def _featurize_chunk(self, chunk: Sequence[str], pad: int):
        """Featurize a batch, using the native C++ path for ASCII texts
        (the native tokenizer is byte-level; unicode stays on the Python
        path so outputs are identical either way)."""
        ids = np.zeros((pad, self.max_features), dtype=np.int32)
        wts = np.zeros((pad, self.max_features), dtype=np.float32)
        native_idx = (
            [i for i, t in enumerate(chunk) if t.isascii()]
            if self.use_native
            else []
        )
        if native_idx:
            from .native import featurize_batch

            result = featurize_batch(
                [chunk[i] for i in native_idx], self.max_features, self.n_buckets
            )
            if result is None:
                native_idx = []
            else:
                ids[native_idx], wts[native_idx] = result
        native_set = set(native_idx)
        for i, t in enumerate(chunk):
            if i not in native_set:
                ids[i], wts[i] = self._featurize(t)
        return ids, wts

    def embed_documents(self, texts: Sequence[str]) -> List[List[float]]:
        if not texts:
            return []
        out: List[List[float]] = []
        for start in range(0, len(texts), self.batch_size):
            chunk = texts[start : start + self.batch_size]
            n = len(chunk)
            # pad small batches to 8 and everything else to the full batch
            # size: exactly two jit shapes ever, which matters on TPU where
            # each new shape is a fresh compile
            pad = 8 if n <= 8 else self.batch_size
            ids, wts = self._featurize_chunk(chunk, pad)
            vecs = self._embed_batch(ids, wts)[:n]
            out.extend(v.tolist() for v in vecs)
        return out

    def embed_query(self, text: str) -> List[float]:
        return self.embed_documents([text])[0]

    def embed_queries(self, texts: Sequence[str]) -> List[List[float]]:
        # hashing featurizes queries and documents identically
        return self.embed_documents(texts)

    def embed_query_device(self, text: str):
        """Device-resident query embedding: returns a padded (8, dim) jax
        array WITHOUT host sync, so the caller can chain straight into a
        device-side index search (one round trip per query total)."""
        ids, wts = self._featurize_chunk([text], 8)
        return _project(self._proj, jnp.asarray(ids), jnp.asarray(wts))

    def embed_queries_device(self, texts: Sequence[str]):
        """Device-resident BATCH query embedding (padded to a multiple of 8,
        no host sync). The serving path chains this into
        ``VectorStore.search_batch_device`` so a whole micro-batch costs ONE
        device round trip — on service-tunnel TPUs the embed fetch was a
        second full RTT per batch (measured ~60 ms at batch 32, half the
        endpoint's per-batch budget)."""
        n = len(texts)
        pad = max(8, -(-n // 8) * 8)
        ids, wts = self._featurize_chunk(list(texts), pad)
        return _project(self._proj, jnp.asarray(ids), jnp.asarray(wts))


@partial(jax.jit, donate_argnums=())
def _project(proj, ids, wts):
    rows = proj[ids]  # (B, F, d) gather
    emb = jnp.sum(rows.astype(jnp.float32) * wts[:, :, None], axis=1)
    norm = jnp.linalg.norm(emb, axis=1, keepdims=True)
    return emb / jnp.maximum(norm, 1e-9)
