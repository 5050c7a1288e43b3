"""Retrieval-quality evaluation harness."""

from .quality import (
    QualityQuery,
    QualityReport,
    evaluate_store,
    generate_queries,
    load_frozen_queries,
)

__all__ = [
    "QualityQuery",
    "QualityReport",
    "evaluate_store",
    "generate_queries",
    "load_frozen_queries",
]
