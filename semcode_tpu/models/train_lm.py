"""Next-token training for the on-TPU answer decoder, sharded over a 2-D mesh.

`semcode-tpu train-lm` fits the causal LM (models/decoder.py) to the ingested
corpus so the ``tpu-lm`` RAG provider can synthesize answers with zero
external assets — the LM analogue of `semcode-tpu train` for the encoder.
The reference cannot do this at all: its chat path rents an API or loads a
pretrained GGUF (reference src/semcode/rag/pipeline.py:254-296).

Parallelism matches the encoder trainer (models/train.py): a ``(data,
model)`` mesh, batch sharded over DP, weights sharded Megatron-style over TP
(c_attn/c_fc split on the output dim, the following projection on the input
dim, so each pair needs one all-reduce which GSPMD inserts). The decoder's
params are a plain pytree, so the same path-based sharding-rule pattern
applies directly.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Dict, Iterator, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .decoder import DecoderConfig, forward_logits, init_params

DATA_AXIS = "data"
MODEL_AXIS = "model"


def param_spec_lm(path: Tuple, leaf) -> P:
    """Tensor-parallel sharding rule for the decoder param tree."""
    keys = [
        getattr(p, "key", getattr(p, "idx", getattr(p, "name", str(p))))
        for p in path
    ]
    joined = "/".join(str(k) for k in keys)
    ndim = getattr(leaf, "ndim", 0)
    if "c_attn" in joined or "c_fc" in joined:  # (h, out): split out dim
        return P(None, MODEL_AXIS) if ndim == 2 else P(MODEL_AXIS)
    if "c_proj" in joined:  # (in, h): split in dim; bias replicated
        return P(MODEL_AXIS, None) if ndim == 2 else P(None)
    if joined == "wte":  # (vocab, h): split hidden; head matmul psums
        return P(None, MODEL_AXIS)
    return P(*([None] * ndim))  # wpe, layernorms: replicated


def _spec_for(mesh: Mesh, path, leaf) -> NamedSharding:
    spec = param_spec_lm(path, leaf)
    if MODEL_AXIS not in mesh.axis_names:
        spec = P(*(None if ax == MODEL_AXIS else ax for ax in spec))
    return NamedSharding(mesh, spec)


class LMTrainer:
    """Owns the sharded next-token train_step for the decoder."""

    def __init__(
        self,
        cfg: DecoderConfig,
        mesh: Mesh,
        *,
        learning_rate: float = 3e-4,
        weight_decay: float = 0.01,
    ):
        self.cfg = cfg
        self.mesh = mesh
        self.tx = optax.adamw(learning_rate, weight_decay=weight_decay)
        self._batch_sharding = NamedSharding(mesh, P(DATA_AXIS, None))
        self._step = None
        self._param_shardings = None
        self._opt_shardings = None

    def init_state(self, seed: int = 0):
        params = init_params(self.cfg, seed=seed)
        self._param_shardings = jax.tree_util.tree_map_with_path(
            lambda path, leaf: _spec_for(self.mesh, path, leaf), params
        )
        params = jax.device_put(params, self._param_shardings)
        opt_shape = jax.eval_shape(self.tx.init, params)
        self._opt_shardings = jax.tree_util.tree_map_with_path(
            lambda path, leaf: _spec_for(self.mesh, path, leaf), opt_shape
        )
        opt_state = jax.jit(self.tx.init, out_shardings=self._opt_shardings)(
            params
        )
        return params, opt_state

    def _loss_fn(self, params, batch):
        logits = forward_logits(params, self.cfg, batch["ids"], batch["mask"])
        targets = batch["ids"][:, 1:]
        valid = batch["mask"][:, 1:].astype(jnp.float32)
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits[:, :-1], targets
        )
        denom = jnp.maximum(jnp.sum(valid), 1.0)
        loss = jnp.sum(ce * valid) / denom
        acc = (
            jnp.sum((jnp.argmax(logits[:, :-1], -1) == targets) * valid) / denom
        )
        return loss, {"loss": loss, "accuracy": acc}

    def _build_step(self):
        def step(params, opt_state, batch):
            (loss, metrics), grads = jax.value_and_grad(
                self._loss_fn, has_aux=True
            )(params, batch)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, metrics

        self._step = jax.jit(
            step,
            in_shardings=(
                self._param_shardings,
                self._opt_shardings,
                {"ids": self._batch_sharding, "mask": self._batch_sharding},
            ),
            out_shardings=(self._param_shardings, self._opt_shardings, None),
            donate_argnums=(0, 1),
        )
        return self._step

    def train_step(self, params, opt_state, batch: Dict[str, np.ndarray]):
        if self._step is None:
            self._build_step()
        device_batch = {
            k: jax.device_put(np.asarray(v), self._batch_sharding)
            for k, v in batch.items()
        }
        return self._step(params, opt_state, device_batch)


def build_qa_texts(chunks, *, ctx_chars: Optional[int] = None) -> list:
    """Question-answer training texts derived from the corpus itself.

    The ``tpu-lm`` provider serves RAG answers in the QA_* prompt grammar
    (models/decoder.py): ``### Context <snippet> ### Question <q>
    ### Answer <a>###``. A corpus-fitted model must SEE that grammar in
    training or chat decoding emits noise regardless of next-token
    accuracy. For every chunk with a defining symbol this builds
    question variants ("what does X do?", "where is X defined?", the
    docstring as a natural-language question) whose answer cites the
    symbol, its file/lines, and its leading docstring — the synthesis a
    code-search answer actually needs. ``chunks``: CodeChunk-likes with
    .content/.symbol/.path/.start_line/.end_line.
    """
    import re

    from .decoder import QA_ANSWER, QA_CONTEXT, QA_CTX_CHARS, QA_QUESTION

    if ctx_chars is None:
        ctx_chars = QA_CTX_CHARS
    doc_re = re.compile(r'(?s)(?:"""|\'\'\')(.+?)(?:"""|\'\'\')')
    out = []
    for c in chunks:
        symbol = getattr(c, "symbol", None)
        if not symbol:
            continue
        path = str(getattr(c, "path", "") or "")
        ctx = (c.content or "")[:ctx_chars]
        m = doc_re.search(c.content or "")
        doc = ""
        if m:
            doc = re.sub(r"\s+", " ", m.group(1)).strip()
            doc = doc.split(". ")[0][:140]
        lines = (
            f" (lines {c.start_line}-{c.end_line})"
            if getattr(c, "start_line", None)
            else ""
        )
        answer = f"`{symbol}` is defined in {path}{lines}."
        if doc:
            answer += f" {doc}."
        for q in (
            f"what does {symbol} do?",
            f"where is {symbol} defined?",
        ):
            out.append(
                f"{QA_CONTEXT}{ctx}{QA_QUESTION}{q}{QA_ANSWER}{answer}\n###"
            )
        if doc and len(doc.split()) >= 4:
            out.append(
                f"{QA_CONTEXT}{ctx}{QA_QUESTION}{doc[:160]}"
                f"{QA_ANSWER}{answer}\n###"
            )
    return out


class WindowBatcher:
    """Random fixed-length token windows over the corpus chunks.

    Each sample is a window from one chunk's byte tokens, EOS-terminated when
    the window reaches the chunk's end — the shapes are static (seq_len), so
    the train step compiles once.

    ``anchored_texts`` (the QA mix) sample differently: always from position
    0, so the model learns the prompt grammar from its start marker —
    a random mid-window crop of a QA example teaches the wrong conditional.
    ``anchored_frac`` of each batch comes from the anchored pool.
    """

    def __init__(
        self,
        texts: Sequence[str],
        tokenizer,
        *,
        seq_len: int = 256,
        batch_size: int = 32,
        seed: int = 0,
        anchored_texts: Sequence[str] = (),
        anchored_frac: float = 0.0,
    ):
        self.docs = [
            tokenizer.encode(t) + [getattr(tokenizer, "EOS_ID", 1)]
            for t in texts
            if t.strip()
        ]
        self.anchored = [
            tokenizer.encode(t) + [getattr(tokenizer, "EOS_ID", 1)]
            for t in anchored_texts
            if t.strip()
        ]
        if not self.docs and not self.anchored:
            raise ValueError("no non-empty chunks to train on")
        self.seq_len = int(seq_len)
        self.batch_size = int(batch_size)
        self.anchored_frac = float(anchored_frac) if self.anchored else 0.0
        self.rng = np.random.default_rng(seed)
        # sample documents proportionally to their length
        docs = self.docs or self.anchored
        if not self.docs:
            self.docs = self.anchored
        lens = np.array([len(d) for d in docs], dtype=np.float64)
        self.doc_p = lens / lens.sum()

    def _sample(self) -> Tuple[np.ndarray, np.ndarray]:
        ids = np.zeros(self.seq_len, dtype=np.int32)
        mask = np.zeros(self.seq_len, dtype=np.int32)
        if self.anchored and self.rng.random() < self.anchored_frac:
            doc = self.anchored[int(self.rng.integers(len(self.anchored)))]
            doc = doc[: self.seq_len]  # anchored: always from position 0
            ids[: len(doc)] = doc
            mask[: len(doc)] = 1
            return ids, mask
        doc = self.docs[int(self.rng.choice(len(self.docs), p=self.doc_p))]
        if len(doc) <= self.seq_len:
            ids[: len(doc)] = doc
            mask[: len(doc)] = 1
        else:
            start = int(self.rng.integers(0, len(doc) - self.seq_len + 1))
            ids[:] = doc[start : start + self.seq_len]
            mask[:] = 1
        return ids, mask

    def batches(self, steps: int) -> Iterator[Dict[str, np.ndarray]]:
        for _ in range(steps):
            rows = [self._sample() for _ in range(self.batch_size)]
            yield {
                "ids": np.stack([r[0] for r in rows]),
                "mask": np.stack([r[1] for r in rows]),
            }


# -- checkpointing ---------------------------------------------------------------


def save_lm_params(params, cfg: DecoderConfig, path) -> None:
    """Serialize trained decoder params + config (msgpack via flax)."""
    from flax import serialization

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    (path / "semcode_lm.msgpack").write_bytes(
        serialization.to_bytes(jax.device_get(params))
    )
    cfg_dict = dataclasses.asdict(cfg)
    cfg_dict["dtype"] = str(np.dtype(cfg.dtype).name) if cfg.dtype else "bfloat16"
    (path / "semcode_lm.json").write_text(json.dumps(cfg_dict))


def load_lm_params(path, dtype: Optional[Any] = None):
    """Load params + config saved by save_lm_params. Returns (params, cfg)."""
    from flax import serialization

    path = Path(path)
    cfg_dict = json.loads((path / "semcode_lm.json").read_text())
    cfg_dict["dtype"] = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
        cfg_dict.get("dtype", "bfloat16")
    ]
    if dtype is not None:
        cfg_dict["dtype"] = dtype
    cfg = DecoderConfig(**cfg_dict)
    template = jax.eval_shape(lambda: init_params(cfg, seed=0))
    params = serialization.from_bytes(
        template, (path / "semcode_lm.msgpack").read_bytes()
    )
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return params, cfg
