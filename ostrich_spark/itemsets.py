"""Frequent item-set mining over a query's match set — the
Elasticsearch ``frequent_item_sets`` aggregation analog (EXTENSION;
the reference has no aggregation plane at all).

The ES agg answers "which combinations of field values co-occur in
significantly many matching docs" (market-basket analysis: device +
geo + error-code combos behind a spike). ES documents its result as
APPROXIMATE (sampled eclat per shard); this implementation is an EXACT
distributed Apriori — deterministic, partition-invariant, and
recomputable by the SQL oracle (documented difference, strictly
stronger).

Items are ``field=value`` strings from doc-value columns (the ES item
representation). Support is a fraction of the MATCHED doc count (the
ES ``minimum_support`` contract).

Scale posture, level by level:

- L1 (frequent single items): one explode + partial-aggregated
  groupBy. The driver only ever sees items above support: each doc
  contributes at most one item per field, so ``|L1| <= n_fields /
  min_support`` — a few hundred rows at realistic settings, NOT the
  value vocabulary. Candidate generation is driver-side over that
  bounded set (the classic Apriori shape every distributed FIM paper
  keeps: candidates are small, counting is the big data side).
- Level k counting stays fully JVM-side: explode transaction items,
  broadcast-join the (item -> candidate) map, count distinct items per
  (transaction, candidate) and keep rows reaching k (subset test as
  relational algebra — no per-row Python), then one groupBy per
  candidate. Two partial-aggregated shuffles per level over data
  already pruned to frequent items.
- The transaction table is built ONCE (items pruned to L1 after level
  1), cached for the level loop, unpersisted at the end.
"""

from __future__ import annotations

import math
from itertools import combinations

from pyspark.sql import functions as F

from .manifest import Manifest, load_manifest


def frequent_item_sets(
    spark,
    index_dir: str,
    query,
    fields: list[str],
    min_support: float = 0.1,
    min_set_size: int = 1,
    max_set_size: int | None = None,
    size: int = 10,
    manifest: Manifest | None = None,
    scorer: str = "tfidf",
    default_fields: list[str] | None = None,
):
    """Mine frequent ``field=value`` combinations from the match set.

    Returns a DataFrame (items, set_size, support_count, support):
    ``items`` is the set's members sorted and comma-joined (a flat
    string — joins/exports/oracle-hashes like any column), ``support``
    the fraction of matched docs containing ALL of them. Ranked
    support_count DESC, set_size DESC (at equal support the larger,
    more informative superset first — the closed-set preference), items
    ASC; cut to ``size`` rows after the ``min_set_size`` filter.

    ``min_support`` is a fraction of matched docs (ES contract; a set
    qualifies at ``count >= ceil(min_support * n_matched)``).
    ``max_set_size`` caps mining depth (default: ``len(fields)``, the
    natural maximum since scalar fields yield one item each).

    NULL field values simply contribute no item (the ES behavior for
    missing values); docs with no non-NULL field still count in the
    support denominator (they matched the query).
    """
    from .query.exec import read_docmap, search

    fields = list(fields)
    if not fields:
        raise ValueError("frequent_item_sets wants >= 1 field")
    if len(set(fields)) != len(fields):
        raise ValueError(f"duplicate fields: {fields}")
    if not (0.0 < min_support <= 1.0):
        raise ValueError(f"min_support must be in (0, 1], got {min_support}")
    if min_set_size < 1:
        raise ValueError(f"min_set_size must be >= 1, got {min_set_size}")
    if size < 1:
        raise ValueError(f"size must be >= 1, got {size}")
    if max_set_size is None:
        max_set_size = len(fields)
    if max_set_size < min_set_size:
        raise ValueError(
            f"max_set_size {max_set_size} < min_set_size {min_set_size}"
        )
    if manifest is None:
        manifest = load_manifest(index_dir)
    res, _ = search(
        spark, index_dir, query, limit=None, scorer=scorer,
        manifest=manifest, default_fields=default_fields,
    )
    docmap = read_docmap(spark, index_dir, manifest)
    matched = docmap.join(
        res.select("segment_id", "doc"), ["segment_id", "doc"], "inner"
    )
    for f in fields:
        if f not in matched.columns:
            raise ValueError(
                f"field {f!r} not a docmap column ({matched.columns})"
            )

    out_schema = (
        "items string, set_size long, support_count long, support double"
    )
    n = matched.count()
    if n == 0:
        return spark.createDataFrame([], out_schema)
    min_count = max(1, math.ceil(min_support * n))

    item_cols = [
        F.when(
            F.col(f).isNotNull(),
            F.concat(F.lit(f"{f}="), F.col(f).cast("string")),
        )
        for f in fields
    ]
    tx = matched.select(
        "segment_id", "doc",
        F.filter(F.array(*item_cols), lambda x: x.isNotNull()).alias("items"),
    ).filter(F.size("items") > 0)
    exploded = tx.select(
        "segment_id", "doc", F.explode("items").alias("item")
    )

    l1_rows = (
        exploded.groupBy("item").count()
        .filter(F.col("count") >= min_count)
        .collect()
    )
    frequent: dict[frozenset, int] = {
        frozenset([r["item"]]): int(r["count"]) for r in l1_rows
    }
    if not frequent:
        return spark.createDataFrame([], out_schema)

    # prune transactions to frequent items once, cache for the loop
    l1_items = sorted(s for fs in frequent for s in fs)
    pruned = exploded.join(
        F.broadcast(
            spark.createDataFrame([(i,) for i in l1_items], "item string")
        ),
        "item",
    ).cache()
    try:
        level = {fs: c for fs, c in frequent.items()}
        k = 2
        while k <= max_set_size and level:
            prev = sorted(level, key=lambda s: tuple(sorted(s)))
            cands = set()
            for i, a in enumerate(prev):
                for b in prev[i + 1 :]:
                    u = a | b
                    if len(u) != k:
                        continue
                    # Apriori prune: every (k-1)-subset must be frequent
                    if all(
                        frozenset(c) in level for c in combinations(u, k - 1)
                    ):
                        cands.add(u)
            if not cands:
                break
            cand_list = sorted(cands, key=lambda s: tuple(sorted(s)))
            pairs = [
                (item, cid)
                for cid, s in enumerate(cand_list)
                for item in s
            ]
            cand_df = F.broadcast(
                spark.createDataFrame(pairs, "item string, cid long")
            )
            counts = (
                pruned.join(cand_df, "item")
                .groupBy("segment_id", "doc", "cid")
                .count()
                .filter(F.col("count") == k)
                .groupBy("cid")
                .count()
                .filter(F.col("count") >= min_count)
                .collect()
            )
            level = {
                cand_list[int(r["cid"])]: int(r["count"]) for r in counts
            }
            frequent.update(level)
            k += 1
    finally:
        pruned.unpersist()

    rows = [
        (",".join(sorted(s)), len(s), c, c / n)
        for s, c in frequent.items()
        if len(s) >= min_set_size
    ]
    rows.sort(key=lambda r: (-r[2], -r[1], r[0]))
    return spark.createDataFrame(rows[: int(size)], out_schema)
