"""spark-submit smoke driver (r3 verdict task #6): run an index build +
three queries + a facet under a REAL multi-executor master
(local-cluster[2,4,4096]) with the package shipped via --py-files —
exercising the serialization/closure boundaries local[32] hides
(separate executor JVMs, python workers importing ostrich_spark from
the shipped zip, task-pickled Arrow UDFs).

Run:
  python tools/package.py
  spark-submit --master local-cluster[2,4,4096] \
      --py-files dist/ostrich_spark.zip tools/smoke_submit.py

Deliberately does NOT sys.path-insert the repo — the import must come
from the --py-files zip (driver and executors alike).
"""

from __future__ import annotations

import shutil
import time

from pyspark.sql import SparkSession


def main():
    spark = (
        SparkSession.builder.appName("ostrich-submit-smoke")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    print("master:", spark.sparkContext.master)
    print("defaultParallelism:", spark.sparkContext.defaultParallelism)

    import ostrich_spark

    print("ostrich_spark imported from:", ostrich_spark.__file__)

    from ostrich_spark.build import build_index
    from ostrich_spark.corpus import corpus_df
    from ostrich_spark.query.exec import facet_counts, search
    from ostrich_spark.schema import Schema

    corpus = corpus_df(spark, 10_000, partitions=8)
    schema = Schema()
    schema.add_text_field("content", "default", positions=True)
    schema.add_keyword_field("lang")

    idx = "/tmp/submit_smoke_idx"
    shutil.rmtree(idx, ignore_errors=True)
    t0 = time.time()
    build_index(
        spark, corpus, schema, idx,
        num_partitions=4, order_col="path", id_cols=["path"],
        build_id="submit-smoke",
    )
    print(f"build: 10k docs / 4 segments in {time.time() - t0:.1f}s")

    checks = []
    for name, q, scorer in [
        ("term_topk", "content:merge_policy", "tfidf"),
        ("wand_or", "content:the OR content:rareterm007", "bm25"),
        ("phrase", 'content:"merge_policy merge_policy"', "bm25"),
    ]:
        t0 = time.time()
        rows = search(spark, idx, q, limit=10, scorer=scorer)[0].collect()
        dt = time.time() - t0
        assert len(rows) > 0, f"{name} returned no rows"
        checks.append((name, len(rows), round(dt, 2)))
        print(f"{name}: {len(rows)} rows in {dt:.1f}s "
              f"(top: doc={rows[0]['doc']} score={rows[0]['score']:.4f})")

    t0 = time.time()
    fc = facet_counts(spark, idx, "content:search", "lang").collect()
    assert len(fc) == 5, f"expected 5 langs, got {fc}"
    print(f"facet_lang: {len(fc)} buckets in {time.time() - t0:.1f}s")

    print("SMOKE OK", checks)
    spark.stop()


if __name__ == "__main__":
    main()
