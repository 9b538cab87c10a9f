"""Percolator scale evidence (r3 verdict task #7): the gate exercises
7-45 subscriptions; this registers 10k generated subscriptions of mixed
kinds (terms, AND/OR/NOT trees, phrases, keyword eq) and measures
docs/sec percolated at two corpus sizes — the fan-in shape a real
alerting plane runs (many stored queries, streaming docs).

Subscription mix (deterministic, index-arithmetic over the corpus
vocabulary — no RNG):
  6_000 single-term    content:<w>
  1_500 AND pairs      content:<w1> AND content:<w2>
  1_000 nested trees   (content:<w1> OR content:<w2>) AND content:<w3>
    500 phrases        content:"<w1> <w2>"
    500 keyword eq     lang:<l>
    500 MUST_NOT trees programmatic BooleanQuery(MUST w1, MUST_NOT w2)
                       (NOT is not an NQL operator — reference parity)

Usage: python tools/ladder_percolate.py [n_docs_small] [n_docs_big] [cpus]
  (defaults 60_000 240_000 16)

Broadcast-ceiling rung (r4 verdict task #7): pass a 4th arg n_subs
(mix scales by n_subs/10_000). With n_subs != 10_000 the tool runs ONE
corpus size (n_docs_small) twice — once with the default broadcast
hint and once with broadcast_cap=0 (every query-side join degrades to
Spark's own sizing, i.e. shuffle) — timing both. That measures the
hint-vs-shuffle crossover at 100k+ subscriptions, where the
requirement/leaf tables approach the 10MB broadcast budget and a
forced broadcast is the OOM risk the cap exists to remove.

  python tools/ladder_percolate.py 20000 20000 16 100000
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ostrich_spark.corpus import _RARE, VOCAB  # noqa: E402


def make_subscriptions(n: int = 10_000, schema=None) -> dict:
    """Mixed subscriptions keyed by id; values are NQL strings except
    the MUST_NOT batch, which needs the programmatic query shape (pass
    ``schema`` to enable it; the register API accepts both). The mix
    scales linearly with n (n must be a multiple of 10_000)."""
    assert n % 10_000 == 0, n
    m = n // 10_000
    words = list(VOCAB) + list(_RARE)
    nw = len(words)
    subs: dict[str, str] = {}
    i = 0

    def w(j):
        return words[j % nw]

    for k in range(6_000 * m):
        subs[f"t{k:06d}"] = f"content:{w(i)}"
        i += 1
    for k in range(1_500 * m):
        subs[f"a{k:06d}"] = f"content:{w(i)} AND content:{w(i + 7)}"
        i += 2
    for k in range(1_000 * m):
        subs[f"n{k:06d}"] = (
            f"(content:{w(i)} OR content:{w(i + 11)}) AND content:{w(i + 23)}"
        )
        i += 3
    for k in range(500 * m):
        subs[f"p{k:06d}"] = f'content:"{w(i)} {w(i + 3)}"'
        i += 2
    langs = ["go", "py", "rs", "java", "ts"]
    for k in range(500 * m):
        subs[f"k{k:06d}"] = f"lang:{langs[k % 5]}"
    from ostrich_spark.query.parser import (
        MUST,
        MUST_NOT,
        BooleanQuery,
        parse_query,
    )

    for k in range(500 * m):
        if schema is None:
            # string fallback: plain AND pair (keeps count at n)
            subs[f"x{k:06d}"] = f"content:{w(i)} AND content:{w(i + 13)}"
        else:
            subs[f"x{k:06d}"] = BooleanQuery([
                (MUST, parse_query(f"content:{w(i)}", schema, None)),
                (MUST_NOT, parse_query(f"content:{w(i + 13)}", schema, None)),
            ])
        i += 2
    assert len(subs) == n
    return subs


def main():
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    n_big = int(sys.argv[2]) if len(sys.argv) > 2 else 240_000
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    n_subs = int(sys.argv[4]) if len(sys.argv) > 4 else 10_000

    from pyspark.sql import SparkSession

    from ladder import CHUNK, gen_corpus  # noqa: E402
    from ostrich_spark.percolate import percolate, register_queries
    from ostrich_spark.schema import Schema

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ostrich-perc-ladder")
        .config("spark.sql.shuffle.partitions", str(max(cpus * 4, 32)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    schema = Schema()
    schema.add_text_field("content", "default", positions=True)
    schema.add_keyword_field("lang")

    t0 = time.time()
    pq = register_queries(make_subscriptions(n_subs, schema=schema), schema)
    reg_sec = time.time() - t0
    print(f"register {n_subs} subscriptions: {reg_sec:.1f}s "
          f"(term rows {len(pq.term_rows)}, req rows {len(pq.req_rows)}, "
          f"tree rows {len(pq.tree_rows)})")

    out = {"n_subs": n_subs, "cpus": cpus, "register_sec": round(reg_sec, 2),
           "term_rows": len(pq.term_rows), "req_rows": len(pq.req_rows)}

    if n_subs != 10_000:
        # broadcast-ceiling rung: ONE corpus size, hinted vs capped-0
        path = f"/tmp/ladder_corpus_{n_small}"
        if not os.path.exists(path):
            gen_corpus(spark, n_small, path)
        docs = spark.read.parquet(path).withColumnRenamed("path", "doc_key")
        docs = docs.repartition(max(cpus * 2, n_small // CHUNK))
        for label, cap in (("hinted", None), ("shuffle", 0)):
            percolate(spark, docs.limit(500), pq, schema, id_col="doc_key",
                      broadcast_cap=cap).count()  # warmup
            t0 = time.time()
            pairs = percolate(spark, docs, pq, schema, id_col="doc_key",
                              broadcast_cap=cap).count()
            dt = time.time() - t0
            out[f"{label}_sec"] = round(dt, 2)
            out[f"{label}_pairs"] = pairs
            print(f"{label}: {n_small} docs x {n_subs} subs -> {pairs} "
                  f"pairs in {dt:.1f}s")
        assert out["hinted_pairs"] == out["shuffle_pairs"]
        out["shuffle_over_hinted"] = round(
            out["shuffle_sec"] / out["hinted_sec"], 3
        )
        print(json.dumps(out))
        spark.stop()
        return

    for label, n_docs in (("small", n_small), ("big", n_big)):
        path = f"/tmp/ladder_corpus_{n_docs}"
        if not os.path.exists(path):
            gen_corpus(spark, n_docs, path)
        docs = spark.read.parquet(path).withColumnRenamed("path", "doc_key")
        docs = docs.repartition(max(cpus * 2, n_docs // CHUNK))
        # warmup: one small batch through the full plan
        percolate(spark, docs.limit(1000), pq, schema,
                  id_col="doc_key").count()
        t0 = time.time()
        pairs = percolate(spark, docs, pq, schema, id_col="doc_key").count()
        dt = time.time() - t0
        rate = n_docs / dt
        out[f"{label}_docs"] = n_docs
        out[f"{label}_sec"] = round(dt, 2)
        out[f"{label}_docs_per_sec"] = round(rate, 1)
        out[f"{label}_pairs"] = pairs
        print(f"{label}: {n_docs} docs x 10k subs -> {pairs} pairs in "
              f"{dt:.1f}s = {rate:.0f} docs/s")
    eff = out["big_docs_per_sec"] / out["small_docs_per_sec"]
    out["throughput_ratio_big_vs_small"] = round(eff, 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
