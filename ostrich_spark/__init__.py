"""ostrich_spark — a PySpark-native full-text index + BM25 query engine.

A from-scratch, Spark-first re-expression of the capabilities of
k-yomo/ostrich (/root/reference): vectorized Arrow-UDF analysis and
segment building, delta+varint packed postings with block-max metadata,
log-structured segment merging with skew-proof sharding, TF-IDF
(rank-identical to the reference) and BM25 (k1=1.2, b=0.75) scoring with
exact block-max WAND pruning, resumable checkpointed builds with
per-partition lineage and metrics — plus the large-scale training-data
operators (dedup, similarity search, text analysis, multimodal plumbing).
"""

__version__ = "0.1.0"

from .schema import Schema, FieldEntry  # noqa: F401
from .build import build_index  # noqa: F401
from .manifest import Manifest, load_manifest  # noqa: F401
from .query import parse_query, search  # noqa: F401
