"""Retrieve -> generate demo: the on-chip `tpu-lm` answer path, warm.

Drives the PRODUCTION pipeline (store retrieval -> chat_structured ->
KV-cached greedy decode on the TPU) in ONE process over several questions,
so every query after the first shows the WARM decode latency — the CLI
runs one process per query and its `llm` stage is dominated by the
one-time decode compile. This is the measurement behind the
retrieve->generate artifact in docs/BENCHMARKS.md (VERDICT round-3 item 5;
the reference rents this path from OpenAI/llama.cpp, reference
src/semcode/rag/pipeline.py:254-296).

Prereq (one-shot, ~10 min on one chip):
  export SEMCODE_WORKSPACE_ROOT=/tmp/ws_lm
  semcode-tpu ingest --name semcode --include semcode_tpu --root /root/repo -y
  semcode-tpu train-lm --repo semcode --steps 2000 --qa-mix 0.5

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site \
  SEMCODE_WORKSPACE_ROOT=/tmp/ws_lm SEMCODE_RAG_PROVIDER=tpu-lm \
  SEMCODE_RAG_WEIGHTS_PATH=/tmp/ws_lm/lm python tools/lm_demo.py [question ...]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

_DEFAULT_QUESTIONS = [
    # the two trained grammar forms, anchored on symbols the corpus tags
    "what does quantize_rows do?",
    "where is hierarchical_topk_merge defined?",
    "what does WindowBatcher do?",
    "what does build_qa_texts do?",
]


def main() -> None:
    questions = sys.argv[1:] or _DEFAULT_QUESTIONS

    from semcode_tpu.rag import SemanticSearchPipeline

    pipeline = SemanticSearchPipeline()
    for i, q in enumerate(questions):
        t0 = time.perf_counter()
        out = pipeline.query(q, top_k=5)
        wall_ms = (time.perf_counter() - t0) * 1000
        print(json.dumps({
            "question": q,
            "answer": out["answer"],
            "fallback_used": out["meta"].get("fallback_used"),
            "top_source": (out["sources"][0]["path"]
                           if out["sources"] else None),
            "wall_ms": round(wall_ms, 1),
            "stage_ms": {k: round(v, 1) for k, v in
                         (out["meta"].get("timings_ms") or {}).items()},
            "warm": i > 0,
        }, ensure_ascii=False), flush=True)


if __name__ == "__main__":
    main()
