"""Training-pair construction for contrastive encoder training.

Unsupervised pairs from the indexed corpus itself (no labels needed):
anchor/positive are two random crops of the same code chunk — the standard
cropping objective for retrieval encoders — so the encoder learns that pieces
of the same unit of code embed together. Batches are fixed-shape numpy arrays
ready for ``ContrastiveTrainer.train_step``.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Sequence

import numpy as np


class PairBatcher:
    def __init__(
        self,
        texts: Sequence[str],
        tokenizer,
        *,
        seq_len: int = 128,
        batch_size: int = 32,
        seed: int = 0,
        min_lines: int = 4,
    ):
        self.texts = [t for t in texts if len(t.splitlines()) >= min_lines]
        if not self.texts:
            raise ValueError("no texts long enough to build training pairs")
        self.tokenizer = tokenizer
        self.seq_len = int(seq_len)
        self.batch_size = int(batch_size)
        self.rng = np.random.default_rng(seed)

    def _crop(self, text: str) -> str:
        lines = text.splitlines()
        n = len(lines)
        span = max(2, int(n * float(self.rng.uniform(0.5, 0.9))))
        start = int(self.rng.integers(0, max(n - span, 0) + 1))
        return "\n".join(lines[start : start + span])

    def batches(self, n_batches: int) -> Iterator[Dict[str, np.ndarray]]:
        for _ in range(n_batches):
            picks: List[int] = self.rng.choice(
                len(self.texts), size=self.batch_size, replace=len(self.texts) < self.batch_size
            ).tolist()
            anchors = [self._crop(self.texts[i]) for i in picks]
            positives = [self._crop(self.texts[i]) for i in picks]
            a_ids, a_mask = self.tokenizer.encode_batch(anchors, max_len=self.seq_len)
            p_ids, p_mask = self.tokenizer.encode_batch(positives, max_len=self.seq_len)
            yield {
                "anchor_ids": a_ids,
                "anchor_mask": a_mask,
                "pos_ids": p_ids,
                "pos_mask": p_mask,
            }
