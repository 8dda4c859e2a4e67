"""Similarity-search operators over the `embeddings` table (extensions).

Brute-force cosine top-k lands first; LSH/IVF-bucketed ANN variants are
added in operators/similarity.py as they land.
"""

from __future__ import annotations

from .registry import register  # noqa: F401  (entries added as ops land)
