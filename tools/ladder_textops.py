"""Weak-scaling rungs for the corpus text operators (dedup_lines +
unigram_lm/unigram_nll): same deterministic corpus as tools/ladder.py,
rewritten into ~12-token lines plus one universal footer line so the
hot-line rule does real work at every size. Reports docs/sec per rung —
the flat-per-doc-cost evidence for BENCH/SCALE_LADDER.md.

Usage: python tools/ladder_textops.py [sizes_csv] [cpus]
  (default sizes 240000,960000 at constant 15k docs/partition)
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
# executor python workers need the package importable too (ladder.py's
# distributed gen pickles make_corpus into mapInPandas tasks)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

from ladder import CHUNK, gen_corpus  # noqa: E402  (tools/ sibling)


def lined_docs(spark, src_path: str):
    """(doc_id, text): content re-flowed into 12-token lines + one
    universal footer line (hot at every corpus size) — all JVM-side."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(src_path)
    toks = F.split(F.col("content"), " ")
    n_lines = F.ceil(F.size(toks) / F.lit(12)).cast("int")
    body = F.concat_ws(
        "\n",
        F.transform(
            F.sequence(F.lit(0), n_lines - 1),
            lambda i: F.array_join(F.slice(toks, i * 12 + 1, 12), " "),
        ),
    )
    return df.select(
        F.xxhash64("path").alias("doc_id"),
        F.concat_ws("\n", body, F.lit("// autogen: corpus footer")).alias("text"),
    )


def main():
    from pyspark.sql import SparkSession

    from ostrich_spark.dedup import dedup_lines
    from ostrich_spark.textops import unigram_lm, unigram_nll

    sizes = [int(s) for s in (sys.argv[1] if len(sys.argv) > 1 else "240000,960000").split(",")]
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ostrich-textops-ladder")
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
        n_docs = docs.count()  # materialize: time the operators, not gen

        t0 = time.time()
        dropped = dedup_lines(docs).agg({"n_dropped": "sum"}).collect()[0][0]
        dl_sec = time.time() - t0

        t0 = time.time()
        model, unk = unigram_lm(docs)
        scored = unigram_nll(docs, model, unk).count()
        ug_sec = time.time() - t0

        print(
            f"RUNG n={n_docs} parts={n // CHUNK}: "
            f"dedup_lines {dl_sec:.1f}s -> {n_docs / dl_sec:.0f} docs/s "
            f"(lines dropped {int(dropped)}), "
            f"unigram_lm+nll {ug_sec:.1f}s -> {n_docs / ug_sec:.0f} docs/s "
            f"(docs scored {scored})"
        )
        docs.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
