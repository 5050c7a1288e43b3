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

from .version import __version__, get_version

__all__ = ["__version__", "get_version"]
