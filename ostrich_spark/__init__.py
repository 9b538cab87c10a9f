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

import os as _os

# One task == one core: Spark already parallelizes across workers, so
# nested BLAS/OpenMP pools only thrash (32 workers x 32 OMP threads =
# 1024 runnable threads -> ~10x per-task slowdown measured). Must be set
# before numpy initializes its thread pools.
for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
           "VECLIB_MAXIMUM_THREADS", "NUMEXPR_NUM_THREADS"):
    _os.environ.setdefault(_v, "1")

__version__ = "0.1.0"

from .schema import Schema, FieldEntry  # noqa: F401
from .build import build_index  # noqa: F401
from .manifest import Manifest, load_manifest  # noqa: F401
from .query import parse_query, search  # noqa: F401
