"""semcode-tpu: a TPU-native semantic code search engine.

From-scratch rebuild of the capabilities of rmontanana/semcode with the
retrieval core (embedding inference + vector index) running in-process on TPU
via JAX/XLA/Pallas instead of remote LangChain providers + an external Milvus
server. See SURVEY.md at the repository root for the full reference analysis.

Subpackages:
    chunking    host-side code chunker (line/char budget + symbol tagging)
    ingestion   workspace copy / ignore patterns / language detection
    embeddings  embedding provider factory (on-TPU + remote providers)
    models      Flax transformer encoder for on-TPU embedding inference
    ops         Pallas kernels and TPU numerics (top-k, k-means, scans)
    index       flat + IVF vector indexes, sharded over a device mesh
    parallel    mesh construction and sharding helpers
    storage     repository registry + index snapshots
    services    the ingest pipeline orchestrator
    rag         query pipeline (retrieve -> prompt -> LLM / fallback)
    api         aiohttp JSON API (jobs, telemetry, auth)
    frontend    built-in web UI + launchers
"""

import os as _os

if _os.environ.get("SEMCODE_JAX_PLATFORM"):
    # Pin the JAX backend before first device use ("cpu" keeps a shared
    # TPU free for another process; tests/eval use this). The plain
    # JAX_PLATFORMS env var is NOT enough on images whose TPU plugin
    # (e.g. axon) pins itself — jax.config wins over the env var.
    import jax as _jax

    _jax.config.update(
        "jax_platforms", _os.environ["SEMCODE_JAX_PLATFORM"]
    )

from .version import __version__, get_version

__all__ = ["__version__", "get_version"]
