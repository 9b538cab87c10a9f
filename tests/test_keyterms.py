"""keyterms: per-doc top-m tf·idf keyword extraction (LLM-pipeline op).
Hand-computed goldens + plan guard (no serial exchange)."""

import math

from ostrich_spark.textops import keyterms


def test_keyterms_hand_computed(spark):
    docs = [
        (0, "apple apple banana"),
        (1, "banana cherry"),
        (2, "cherry cherry cherry date"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        (r["doc_id"], r["rank"]): (r["term"], r["tf"], r["score"])
        for r in keyterms(df, "text", top_m=2).collect()
    }
    idf = lambda d: 1.0 + math.log(3 / (1.0 + d))
    sc = lambda tf, d: round(tf * idf(d), 6)
    # doc 0: apple tf2 df1, banana tf1 df2
    assert got[(0, 1)] == ("apple", 2, sc(2, 1))
    assert got[(0, 2)] == ("banana", 1, sc(1, 2))
    # doc 1: banana and cherry both tf1 df2 -> tie broken term asc
    assert got[(1, 1)] == ("banana", 1, sc(1, 2))
    assert got[(1, 2)] == ("cherry", 1, sc(1, 2))
    # doc 2: cherry tf3 beats date tf1 df1
    assert got[(2, 1)] == ("cherry", 3, sc(3, 2))
    assert got[(2, 2)] == ("date", 1, sc(1, 1))
    assert len(got) == 6


def test_keyterms_plan_no_serial_stage(spark):
    df = spark.createDataFrame(
        [(i, f"alpha beta doc{i}") for i in range(20)], ["doc_id", "text"]
    )
    plan = keyterms(df, "text", top_m=2)._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    # the per-doc window partitions by doc_id, never globally
    assert "row_number" in plan
