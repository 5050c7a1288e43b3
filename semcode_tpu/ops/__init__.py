"""TPU numerics: k-means build, fused scan kernels, top-k utilities."""

from .kmeans import kmeans_fit

__all__ = ["kmeans_fit"]
