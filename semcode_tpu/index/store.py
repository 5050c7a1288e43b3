"""Host-side vector store facade (placeholder; implemented next)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional


@dataclass
class SearchHit:
    id: str
    score: float
    repo: Optional[str] = None
    path: Optional[str] = None
    language: Optional[str] = None
    text: Optional[str] = None
    metadata: Optional[Dict[str, Any]] = None


class VectorStore:  # pragma: no cover - placeholder
    def __init__(self, *args, **kwargs):
        raise NotImplementedError("VectorStore lands in the next milestone")
