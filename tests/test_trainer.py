"""Contrastive trainer: sharded step runs, loss decreases, params stay sharded."""

import numpy as np

import jax

from semcode_tpu.models.encoder import EncoderConfig
from semcode_tpu.models.train import ContrastiveTrainer
from semcode_tpu.parallel.mesh import make_mesh


def _tiny_cfg():
    return EncoderConfig(
        vocab_size=512, hidden=128, layers=2, heads=4, mlp_dim=256, max_len=32
    )


def _batch(rng, n, seq, vocab):
    ids = rng.integers(2, vocab, (n, seq)).astype(np.int32)
    noisy = ids.copy()
    flip = rng.random(noisy.shape) < 0.1
    noisy[flip] = rng.integers(2, vocab, int(flip.sum()))
    ones = np.ones((n, seq), dtype=np.int32)
    return {
        "anchor_ids": ids,
        "anchor_mask": ones,
        "pos_ids": noisy,
        "pos_mask": ones,
    }


def test_train_step_loss_decreases():
    mesh = make_mesh((4, 2), ("data", "model"))
    cfg = _tiny_cfg()
    trainer = ContrastiveTrainer(cfg, mesh, learning_rate=3e-4)
    params, opt_state = trainer.init_state(jax.random.PRNGKey(0), seq_len=32)
    rng = np.random.default_rng(0)
    batch = _batch(rng, 16, 32, cfg.vocab_size)
    losses = []
    for _ in range(8):
        params, opt_state, metrics = trainer.train_step(params, opt_state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"


def test_param_shardings_are_tensor_parallel():
    mesh = make_mesh((4, 2), ("data", "model"))
    cfg = _tiny_cfg()
    trainer = ContrastiveTrainer(cfg, mesh)
    params, _ = trainer.init_state(jax.random.PRNGKey(0), seq_len=32)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    mlp_in = [l for p, l in flat if "mlp_in" in str(p) and l.ndim == 2][0]
    from jax.sharding import PartitionSpec as P

    assert mlp_in.sharding.spec == P(None, "model")
    ln = [l for p, l in flat if "ln1" in str(p)][0]
    assert ln.sharding.spec == P(None)
