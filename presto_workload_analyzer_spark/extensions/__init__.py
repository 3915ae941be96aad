"""Beyond-reference extensions: LLM-training-data pipeline operators.

Not part of the reference's surface (SURVEY.md §7 phase 8): deduplication
(exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine),
similarity search (brute-force + LSH-bucketed ANN), text analysis
(language-ID, quality, token counting, fingerprinting) and multimodal
column plumbing — all designed for 100 TB corpora.
"""

from presto_workload_analyzer_spark.extensions import (
    dedup,
    multimodal,
    sampling,
    similarity,
    textstats,
)

__all__ = ["dedup", "multimodal", "sampling", "similarity", "textstats"]
