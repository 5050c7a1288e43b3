"""Held-out retrieval-quality harness (reproducible).

Chunks one or more source trees DIRECTLY (no workspace ceremony), builds an
in-memory VectorStore per provider through the production embedding path
(doc-side expansion via providers.embedding_text, exactly what
services/indexer.py embeds), generates self-labelled queries
(eval/quality.py), and scores MRR@10 / recall@k.

The canonical held-out corpora (excluded from encoder training):

    python tools/eval_heldout.py --corpus aiohttp
    python tools/eval_heldout.py --corpus reference
    python tools/eval_heldout.py --corpus both --provider tpu-hybrid

Used for the docs/BENCHMARKS.md "Retrieval quality, held-out" table and the
VERDICT quality bars (aiohttp >= 0.75 / reference >= 0.85 MRR@10).
"""

from __future__ import annotations

import argparse
import fnmatch
import hashlib
import json
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

import os  # noqa: E402

if os.environ.get("SEMCODE_TOOL_PLATFORM"):
    # the image pins JAX_PLATFORMS=axon and the plugin ignores the env
    # override, so forcing CPU (to keep the one real chip free) must go
    # through jax.config before backend init — same trick as tests/conftest
    import jax

    jax.config.update("jax_platforms", os.environ["SEMCODE_TOOL_PLATFORM"])


def corpus_dir(name: str) -> Path:
    if name == "aiohttp":
        import aiohttp

        return Path(aiohttp.__file__).parent
    if name == "reference":
        return Path("/root/reference/src")
    p = Path(name)
    if p.is_dir():
        return p
    raise SystemExit(f"unknown corpus {name!r} (not a directory)")


def chunk_corpus(name: str, root: Path):
    """-> list of (payload_id, metadata) with indexer-parity metadata."""
    from semcode_tpu.chunking import CodeChunker
    from semcode_tpu.cli import CHUNK_SUFFIXES
    from semcode_tpu.ingestion.manager import DEFAULT_IGNORE_PATTERNS

    chunker = CodeChunker()
    files = [
        f
        for f in sorted(root.rglob("*"))
        if f.is_file()
        and f.suffix in CHUNK_SUFFIXES
        and not any(
            fnmatch.fnmatch(part, pat)
            for part in f.relative_to(root).parts
            for pat in DEFAULT_IGNORE_PATTERNS
        )
    ]
    metas = []
    span_seen: dict = {}
    for chunk in chunker.chunk_repository(root, files):
        rel = str(Path(chunk.path).relative_to(root))
        span_key = f"{name}:{rel}:{chunk.start_line}:{chunk.end_line}"
        ordinal = span_seen.get(span_key, 0)
        span_seen[span_key] = ordinal + 1
        cid = hashlib.md5(
            (span_key + (f"#{ordinal}" if ordinal else "")).encode()
        ).hexdigest()
        metas.append(
            (
                cid,
                {
                    "repo": name,
                    "path": rel,
                    "language": chunk.language,
                    "start_line": chunk.start_line,
                    "end_line": chunk.end_line,
                    "symbol": chunk.symbol,
                    "text": chunk.content,
                },
            )
        )
    return metas


def evaluate(metas, provider: str, max_per_kind: int, overrides: dict):
    from semcode_tpu.eval import (
        build_eval_store,
        evaluate_store,
        generate_queries,
    )
    from semcode_tpu.settings import settings

    cfg = settings.model_copy(
        update={"embedding_provider": provider, **overrides}
    )
    # shared recipe (eval.build_eval_store): PRODUCTION embedding path —
    # doc-side symbol/stem expansion shapes the vector, stored text stays raw
    t0 = time.time()
    store, emb = build_eval_store(metas, cfg)
    embed_s = time.time() - t0
    queries = generate_queries(metas, max_per_kind=max_per_kind)
    t0 = time.time()
    report = evaluate_store(
        store, emb, provider_name=provider, queries=queries
    )
    out = report.as_dict()
    out["embed_s"] = round(embed_s, 1)
    out["eval_s"] = round(time.time() - t0, 1)
    out["n_chunks"] = len(metas)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="both",
                    help="aiohttp | reference | both | <dir>")
    ap.add_argument("--provider", action="append", default=None)
    ap.add_argument("--max-per-kind", type=int, default=150)
    ap.add_argument("--set", action="append", default=[],
                    help="settings override key=value (repeatable)")
    args = ap.parse_args()

    overrides: dict = {}
    for kv in args.set:
        k, _, v = kv.partition("=")
        try:
            vv = json.loads(v)
        except json.JSONDecodeError:
            vv = v
        overrides[k] = vv

    names = (
        ["aiohttp", "reference"] if args.corpus == "both" else [args.corpus]
    )
    providers = args.provider or ["tpu-hybrid"]
    results = {}
    for name in names:
        metas = chunk_corpus(name, corpus_dir(name))
        for prov in providers:
            r = evaluate(metas, prov, args.max_per_kind, dict(overrides))
            results[f"{name}/{prov}"] = r
            print(
                f"[{name}/{prov}] n={r['n_queries']} mrr@10={r['mrr@10']} "
                f"r@5={r['recall@5']} r@10={r['recall@10']} "
                f"(embed {r['embed_s']}s, eval {r['eval_s']}s)",
                flush=True,
            )
    print(json.dumps(results, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
