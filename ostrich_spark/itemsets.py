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
  groupBy. Each doc contributes at most one item per field, so
  ``|L1| <= n_fields / min_support`` — a few hundred at realistic
  settings. A LOW min_support on a wide corpus can still blow that
  bound up, so the mining loop has TWO modes picked by measuring
  |L1| (a count, not a collect):
- ``|L1| <= driver_cap`` (default 2048): the classic Apriori shape —
  candidates generated driver-side over the bounded set, counting
  distributed (broadcast candidate join). Fastest at sandbox scale.
- ``|L1| > driver_cap``: EVERYTHING stays in DataFrames. Candidate
  generation is the F_{k-1} x F_{k-1} shared-prefix self-join, the
  Apriori subset prune is a posexplode + join against the frequent
  level (all k of a candidate's (k-1)-subsets must be frequent),
  and counting joins candidate items to transactions with a plain
  shuffle join (AQE may broadcast if small). No per-level collect,
  no O(|L|^2) driver loop — the final ranked ``size`` rows are the
  only thing that reaches the driver.
- ``|L1| > max_l1`` (default 1_000_000) raises loudly with guidance
  to raise ``min_support`` — an unbounded item universe means the
  support floor is effectively zero and no engine mines that
  meaningfully.
- Level-k counting in both modes stays JVM-side: explode transaction
  items, join the (item -> candidate) map, count distinct items per
  (transaction, candidate) and keep rows reaching k (subset test as
  relational algebra — no per-row Python), then one groupBy per
  candidate. Partial-aggregated shuffles over data already pruned to
  frequent items.
- The transaction table is built ONCE (items pruned to L1 after level
  1), cached for the level loop, unpersisted at the end.
"""

from __future__ import annotations

import math
from itertools import combinations

from pyspark.sql import functions as F

from .manifest import Manifest, load_manifest

OUT_SCHEMA = "items string, set_size long, support_count long, support double"


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
    driver_cap: int = 2048,
    max_l1: int = 1_000_000,
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

    ``driver_cap`` picks the mining mode on measured |L1| (see module
    docstring); ``max_l1`` is the loud upper bound. Both modes return
    IDENTICAL results (pinned by test).

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

    n = matched.count()
    if n == 0:
        return spark.createDataFrame([], OUT_SCHEMA)
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
    # Analytic |L1| bound: each matched doc contributes at most one item
    # per field, so total item rows <= n * len(fields) and every frequent
    # item needs >= min_count of them. When that bound already fits under
    # driver_cap, the standalone |L1| count job is pure overhead — driver
    # mode's L1 collect IS the measurement.
    return mine_itemsets(
        spark, exploded, n, min_count,
        min_set_size=min_set_size, max_set_size=max_set_size, size=size,
        driver_cap=driver_cap, max_l1=max_l1,
        l1_bound=(n * len(fields)) // min_count,
    )


def mine_itemsets(
    spark,
    exploded,
    n: int,
    min_count: int,
    min_set_size: int = 1,
    max_set_size: int = 16,
    size: int = 10,
    driver_cap: int = 2048,
    max_l1: int = 1_000_000,
    l1_bound: int | None = None,
):
    """Mode-picking Apriori core over a generic transactions frame
    ``exploded`` = (segment_id, doc, item) — one row per (transaction,
    item). Factored out of :func:`frequent_item_sets` so the
    DataFrame-mode path is testable on synthetic transactions without
    building an index. Returns the ranked (items, set_size,
    support_count, support) frame; both modes produce identical rows.

    PRECONDITION: ``exploded`` must have no duplicate (segment_id, doc,
    item) rows — the level-k subset test counts distinct candidate items
    per transaction as ``count == k``, so duplicate rows silently
    over-count support. :func:`frequent_item_sets` satisfies this by
    construction (one item per scalar field per doc); generic callers
    with possibly-duplicated rows must apply
    ``.dropDuplicates(["segment_id", "doc", "item"])`` first (not done
    here unconditionally — it is a full shuffle the common caller never
    needs).

    ``l1_bound``: an analytic upper bound on |L1| if the caller knows
    one (e.g. n_transactions * max_items_per_tx // min_count). When the
    bound already fits under ``driver_cap``, the standalone |L1| count
    job is skipped — driver mode's L1 collect is the measurement.
    """
    l1_df = (
        exploded.groupBy("item").count()
        .filter(F.col("count") >= min_count)
    )
    if l1_bound is not None and l1_bound <= driver_cap:
        # bound <= driver_cap <= max_l1: mode + both guards decided
        # analytically, no extra count job. _mine_driver handles the
        # |L1| == 0 case (empty collect -> empty ranked frame).
        return _mine_driver(
            spark, exploded, l1_df, n, min_count,
            min_set_size, max_set_size, size,
        )
    l1_size = l1_df.count()
    if l1_size == 0:
        return spark.createDataFrame([], OUT_SCHEMA)
    if l1_size > max_l1:
        raise ValueError(
            f"|L1| = {l1_size} frequent items exceeds max_l1={max_l1}; "
            f"raise min_support (the support floor is "
            f"{min_count}/{n} matched docs) — an item universe this "
            "wide cannot be mined meaningfully at any engine"
        )
    if l1_size <= driver_cap:
        return _mine_driver(
            spark, exploded, l1_df, n, min_count,
            min_set_size, max_set_size, size,
        )
    return _mine_df(
        spark, exploded, l1_df, n, min_count,
        min_set_size, max_set_size, size,
    )


def _mine_driver(
    spark, exploded, l1_df, n, min_count, min_set_size, max_set_size, size
):
    """Classic Apriori: candidates generated driver-side over the
    (measured-small) frequent sets; counting distributed via broadcast
    candidate join. |L| is <= driver_cap so the O(|L|^2) generation
    loop is bounded by construction."""
    l1_rows = l1_df.collect()
    frequent: dict[frozenset, int] = {
        frozenset([r["item"]]): int(r["count"]) for r in l1_rows
    }

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
    return spark.createDataFrame(rows[: int(size)], OUT_SCHEMA)


def _mine_df(
    spark, exploded, l1_df, n, min_count, min_set_size, max_set_size, size
):
    """All-DataFrame Apriori for wide L1 (|L1| > driver_cap): no level
    ever reaches the driver.

    - Generation, k=2: FROM THE DATA — self-join the L1-pruned
      transactions on the transaction key with item_a < item_b, so
      candidate pairs are bounded by actual co-occurrence (<=
      t(t-1)/2 per transaction, t <= n_fields), never the |L1|^2
      cross of frequent singles — the level where shared-prefix
      generation degenerates (empty prefix = cross join).
    - Generation, k>=3: the F_{k-1} x F_{k-1} shared-prefix self-join
      — two frequent (k-1)-sets agreeing on their first k-2 items,
      last items ordered, union to a sorted k-candidate. Complete: any
      frequent k-set's two largest-item-removed subsets are frequent
      and share the first k-2 items.
    - Prune: posexplode each candidate into its k (k-1)-subsets
      (remove-by-position keeps sort order) and inner-join against the
      frequent level's keys; a candidate survives iff all k subsets
      match. Relational algebra only.
    - Count: explode candidate items, shuffle-join to the L1-pruned
      transactions, per-(transaction, candidate) distinct-item count
      == k, then one partial-aggregated groupBy per candidate.
    - Result: the lazy union of level frames, ranked and cut to
      ``size`` — a TakeOrdered; only those rows reach the driver.
    """
    key = F.array_join(F.col("items"), ",")
    level_df = l1_df.select(
        F.array("item").alias("items"), F.col("count")
    ).withColumn("key", key).cache()

    pruned = exploded.join(l1_df.select("item"), "item").cache()
    results = [level_df.select("items", "count")]
    cached = [level_df, pruned]
    try:
        if max_set_size >= 2:
            # k=2 from the data: co-occurring L1-item pairs per
            # transaction, counted directly — no L1 x L1 cross
            pa, pb = pruned.alias("pa"), pruned.alias("pb")
            pairs2 = (
                pa.join(
                    pb,
                    (F.col("pa.segment_id") == F.col("pb.segment_id"))
                    & (F.col("pa.doc") == F.col("pb.doc"))
                    & (F.col("pa.item") < F.col("pb.item")),
                )
                .groupBy(
                    F.col("pa.item").alias("i1"), F.col("pb.item").alias("i2")
                )
                .count()
                .filter(F.col("count") >= min_count)
                .select(
                    F.array("i1", "i2").alias("items"),
                    "count",
                    F.concat_ws(",", "i1", "i2").alias("key"),
                )
                .cache()
            )
            cached.append(pairs2)
            if pairs2.limit(1).count() > 0:
                results.append(pairs2.select("items", "count"))
                level_df = pairs2
            else:
                level_df = None

        k = 3
        while level_df is not None and k <= max_set_size:
            kk = k - 1  # parent size
            parents = level_df.select(
                F.expr(f"slice(items, 1, {kk - 1})").alias("prefix"),
                F.element_at("items", kk).alias("last"),
                "items",
            )
            a, b = parents.alias("a"), parents.alias("b")
            cand = (
                a.join(b, (F.col("a.prefix") == F.col("b.prefix"))
                       & (F.col("a.last") < F.col("b.last")))
                .select(
                    F.concat(
                        F.col("a.items"), F.array(F.col("b.last"))
                    ).alias("items")
                )
            )
            cand = cand.withColumn("ckey", F.array_join("items", ","))
            # Apriori prune: all k (k-1)-subsets frequent. Subset j =
            # items minus position j (1-based), order-preserving.
            subsets = cand.select(
                "ckey", "items",
                F.posexplode(F.col("items")).alias("pos", "_drop"),
            ).select(
                "ckey", "items",
                F.array_join(
                    F.concat(
                        F.expr("slice(items, 1, pos)"),
                        F.expr("slice(items, pos + 2, size(items))"),
                    ),
                    ",",
                ).alias("skey"),
            )
            surv = (
                subsets.join(
                    level_df.select(F.col("key").alias("skey")), "skey"
                )
                .groupBy("ckey")
                .agg(F.first("items").alias("items"), F.count("*").alias("hit"))
                .filter(F.col("hit") == k)
                .select("ckey", "items")
            )
            cand_items = surv.select(
                "ckey", F.explode("items").alias("item")
            )
            counted = (
                pruned.join(cand_items, "item")
                .groupBy("segment_id", "doc", "ckey")
                .count()
                .filter(F.col("count") == k)
                .groupBy("ckey")
                .count()
                .filter(F.col("count") >= min_count)
            )
            nxt = (
                counted.join(surv, "ckey")
                .select("items", "count", F.col("ckey").alias("key"))
                .cache()
            )
            cached.append(nxt)
            if nxt.limit(1).count() == 0:
                break
            results.append(nxt.select("items", "count"))
            level_df = nxt
            k += 1

        out = results[0]
        for r in results[1:]:
            out = out.unionByName(r)
        ranked = (
            out.filter(F.size("items") >= min_set_size)
            .select(
                F.array_join("items", ",").alias("items"),
                F.size("items").cast("long").alias("set_size"),
                F.col("count").alias("support_count"),
                (F.col("count") / F.lit(float(n))).alias("support"),
            )
            .orderBy(
                F.desc("support_count"), F.desc("set_size"), F.asc("items")
            )
            .limit(int(size))
        )
        # materialize before unpersisting the level caches it reads
        rows = ranked.collect()
    finally:
        for c in cached:
            c.unpersist()
    return spark.createDataFrame(rows, OUT_SCHEMA) if rows else (
        spark.createDataFrame([], OUT_SCHEMA)
    )
