"""stacksearch_ray — a Ray-Data-native full-text index + BM25 engine.

A from-scratch rebuild of the capabilities of farjun/StackSearch
(/root/reference, read-only) on Ray Data: tokenize in ``map_batches`` over
zero-copy Arrow, build doc_id-sorted delta+varint-compressed posting lists
per (term, shard) via a term-partitioned groupby shuffle, query with BM25
block-max WAND — plus the large-scale training-data operators (dedup,
similarity search, text analysis, multimodal plumbing).

Never calls ``ray.init`` — sessions are owned by the caller (driver, tests,
bench.py).
"""

from .codec import BM25_B, BM25_K1
from .text import clean_query, clean_string

__all__ = ["clean_query", "clean_string", "BM25_K1", "BM25_B"]
__version__ = "0.1.0"
