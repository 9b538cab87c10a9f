"""Weak-scaling rungs for exact substring-span dedup
(dedup.repeated_spans): same deterministic corpus as tools/ladder.py,
re-flowed into lines exactly like ladder_textops so the token stream
repeats realistically (the shared footer + templated content make k-token
windows genuinely hot). Reports docs/sec + tokens removed per rung — the
linear-shingle-inventory evidence for BENCH/SCALE_LADDER.md.

Usage: python tools/ladder_spans.py [sizes_csv] [cpus] [k] [hashed01]
  (default sizes 240000,960000 at constant 15k docs/partition, k=12,
  hashed01=1 keys shingles on xxhash64 instead of the exact string)
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

from ladder import CHUNK, gen_corpus  # noqa: E402
from ladder_textops import lined_docs  # noqa: E402


def main():
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from ostrich_spark.dedup import repeated_spans

    sizes = [int(s) for s in (sys.argv[1] if len(sys.argv) > 1 else "240000,960000").split(",")]
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    hashed = len(sys.argv) > 4 and sys.argv[4] == "1"
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ostrich-spans-ladder")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    for n in sizes:
        path = f"/tmp/ostrich_ladder_corpus_{n}"
        if not os.path.exists(path + "/_SUCCESS"):
            gen_corpus(spark, n, path)
        docs = lined_docs(spark, path).cache()
        n_docs = docs.count()

        t0 = time.time()
        agg = repeated_spans(docs, k=k, hash_shingles=hashed).agg(
            F.sum("n_removed").alias("rm"), F.sum("n_kept").alias("kp")
        ).collect()[0]
        sec = time.time() - t0
        print(
            f"RUNG n={n_docs} parts={n // CHUNK} k={k} hashed={int(hashed)}: "
            f"repeated_spans {sec:.1f}s -> {n_docs / sec:.0f} docs/s "
            f"(tokens removed {int(agg['rm'])}, kept {int(agg['kp'])})",
            flush=True,
        )
        docs.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
