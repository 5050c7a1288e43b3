"""TPU-native vector indexes.

Replaces the reference's external Milvus server (reference
src/semcode/storage/milvus_store.py + docker-compose.yml) with in-process,
HBM-resident indexes sharded over a device mesh:

- ``FlatIndex``: exact scan — jit matmul + per-shard top-k + all-gather merge.
  Serves as the recall oracle and the default index for small corpora.
- ``IVFIndex``: IVF_FLAT equivalent — on-TPU k-means build, coarse-quantizer
  assignment, nprobe cluster scans with fused distance+top-k.
- ``VectorStore``: the host-side facade with the reference's
  connect/upsert_embeddings/search surface plus snapshot persistence.
"""

from .flat import FlatIndex
from .ivf import IVFIndex
from .store import SearchHit, VectorStore

__all__ = ["FlatIndex", "IVFIndex", "VectorStore", "SearchHit"]
