"""Contrastive training for the code encoder, sharded over a 2-D mesh.

InfoNCE over (anchor, positive) text pairs — the standard recipe for training
retrieval encoders. The reference has no training at all (it rents embeddings
over HTTP); here the encoder can be trained/fine-tuned in-process, on the same
corpus the index serves.

Parallelism is pjit/GSPMD-style: a ``(data, model)`` mesh where the batch is
sharded over ``data`` (DP) and the transformer weights are sharded over
``model`` (TP: attention heads and MLP hidden split across chips; XLA inserts
the all-reduces). In-batch negatives make the loss depend on the full batch,
so GSPMD also inserts the embedding all-gather for the logits matrix — no
hand-written collectives needed.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .encoder import CodeEncoder, EncoderConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"


def param_spec(path: Tuple, leaf) -> P:
    """Tensor-parallel sharding rule by parameter path."""
    keys = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    joined = "/".join(str(k) for k in keys)
    ndim = getattr(leaf, "ndim", 0)
    if "attn" in joined:
        if any(k in joined for k in ("query", "key", "value")):
            # kernel (hidden, heads, head_dim) / bias (heads, head_dim)
            return P(None, MODEL_AXIS, None) if ndim == 3 else P(MODEL_AXIS, None)
        if "out" in joined:
            # kernel (heads, head_dim, hidden) / bias (hidden,)
            return P(MODEL_AXIS, None, None) if ndim == 3 else P(None)
    if "mlp_in" in joined:
        return P(None, MODEL_AXIS) if ndim == 2 else P(MODEL_AXIS)
    if "mlp_out" in joined:
        return P(MODEL_AXIS, None) if ndim == 2 else P(None)
    if "tok_emb" in joined and ndim == 2:
        return P(None, MODEL_AXIS)
    return P(*([None] * ndim))  # layernorms, pos/type embeddings: replicated


def _spec_for(mesh: Mesh, path, leaf) -> NamedSharding:
    spec = param_spec(path, leaf)
    if MODEL_AXIS not in mesh.axis_names:
        # DP-only mesh: replicate what TP would have sharded
        spec = P(*(None if ax == MODEL_AXIS else ax for ax in spec))
    return NamedSharding(mesh, spec)


def make_param_shardings(mesh: Mesh, params) -> Any:
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _spec_for(mesh, path, leaf), params
    )


class ContrastiveTrainer:
    """Owns the sharded train_step for InfoNCE encoder training."""

    def __init__(
        self,
        cfg: EncoderConfig,
        mesh: Mesh,
        *,
        learning_rate: float = 1e-4,
        weight_decay: float = 0.01,
        temperature: float = 0.05,
    ):
        self.cfg = cfg
        self.mesh = mesh
        self.model = CodeEncoder(cfg)
        self.tx = optax.adamw(learning_rate, weight_decay=weight_decay)
        self.temperature = temperature
        self._batch_sharding = NamedSharding(mesh, P(DATA_AXIS, None))
        self._step = None
        self._param_shardings = None
        self._opt_shardings = None

    # -- state -------------------------------------------------------------------

    def init_state(self, rng: jax.Array, seq_len: int = 64):
        ids = jnp.zeros((8, seq_len), dtype=jnp.int32)
        mask = jnp.ones((8, seq_len), dtype=jnp.int32)
        params = jax.eval_shape(self.model.init, rng, ids, mask)
        self._param_shardings = make_param_shardings(self.mesh, params)
        init_fn = jax.jit(
            self.model.init, out_shardings=self._param_shardings
        )
        params = init_fn(rng, ids, mask)
        # adam moments embed the param tree paths, so the same path-based rule
        # shards them; scalars (step count) come out replicated (ndim == 0)
        opt_shape = jax.eval_shape(self.tx.init, params)
        self._opt_shardings = jax.tree_util.tree_map_with_path(
            lambda path, leaf: _spec_for(self.mesh, path, leaf),
            opt_shape,
        )
        opt_state = jax.jit(self.tx.init, out_shardings=self._opt_shardings)(
            params
        )
        return params, opt_state

    # -- step --------------------------------------------------------------------

    def _loss_fn(self, params, batch):
        emb_a = self.model.apply(params, batch["anchor_ids"], batch["anchor_mask"])
        emb_b = self.model.apply(params, batch["pos_ids"], batch["pos_mask"])
        logits = (emb_a @ emb_b.T) / self.temperature  # (B, B), f32
        labels = jnp.arange(logits.shape[0])
        loss_ab = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        loss_ba = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels)
        loss = jnp.mean(loss_ab + loss_ba) * 0.5
        acc = jnp.mean(jnp.argmax(logits, axis=1) == labels)
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
                {
                    "anchor_ids": self._batch_sharding,
                    "anchor_mask": self._batch_sharding,
                    "pos_ids": self._batch_sharding,
                    "pos_mask": self._batch_sharding,
                },
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


# -- checkpointing ---------------------------------------------------------------


def save_params(params, cfg: EncoderConfig, path, *, half: bool = False) -> None:
    """Serialize trained encoder params + config (msgpack via flax).

    ``half=True`` casts weights to float16 on disk (halves checkpoint size
    for shipping; load_params restores float32). Inference runs in bf16
    anyway, so the f16 round-trip is lossless for serving purposes."""
    import dataclasses
    import json
    from pathlib import Path

    from flax import serialization

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    host_params = jax.device_get(params)
    if half:
        host_params = jax.tree_util.tree_map(
            lambda x: np.asarray(x, dtype=np.float16), host_params
        )
    (path / "semcode_encoder.msgpack").write_bytes(
        serialization.to_bytes(host_params)
    )
    cfg_dict = dataclasses.asdict(cfg)
    cfg_dict["dtype"] = str(np.dtype(cfg.dtype).name) if cfg.dtype else "bfloat16"
    (path / "semcode_encoder.json").write_text(json.dumps(cfg_dict))


def load_params(path):
    """Load params + config saved by save_params. Returns (params, cfg)."""
    import json
    from pathlib import Path

    import jax.numpy as jnp_
    from flax import serialization

    from .encoder import CodeEncoder

    path = Path(path)
    cfg_dict = json.loads((path / "semcode_encoder.json").read_text())
    cfg_dict["dtype"] = {"bfloat16": jnp_.bfloat16, "float32": jnp_.float32}[
        cfg_dict.get("dtype", "bfloat16")
    ]
    cfg = EncoderConfig(**cfg_dict)
    model = CodeEncoder(cfg)
    template = jax.eval_shape(
        model.init,
        jax.random.PRNGKey(0),
        jnp_.zeros((1, 8), jnp_.int32),
        jnp_.ones((1, 8), jnp_.int32),
    )
    params = serialization.from_bytes(
        template, (path / "semcode_encoder.msgpack").read_bytes()
    )
    # half-precision shipped checkpoints restore to f32 (compute casts to
    # the model dtype anyway; keeping master weights f32 lets training resume)
    params = jax.tree_util.tree_map(
        lambda x: jnp_.asarray(
            x, dtype=jnp_.float32 if np.asarray(x).dtype == np.float16 else None
        ),
        params,
    )
    return params, cfg
