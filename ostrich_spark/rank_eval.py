"""Ranking evaluation — the Elasticsearch ``_rank_eval`` API analog
(EXTENSION; the reference has no evaluation surface). Given a set of
requests (query + rated documents), runs the whole set as ONE Spark job
(``search_many`` — the batched path, so an evaluation suite of hundreds
of queries pays one scheduling floor) and computes a ranking metric per
query plus the mean, exactly like the ES response shape.

Metrics (ES definitions):

- ``precision`` (P@k): relevant retrieved / retrieved, where relevant
  means rating >= ``relevant_threshold``. ``ignore_unlabeled=True``
  drops unrated hits from the denominator (the ES option; default
  counts them as non-relevant).
- ``recall`` (R@k): relevant retrieved / total relevant RATED docs.
  A request with no relevant rated docs scores 0.0 (documented edge).
- ``mrr``: 1 / rank of the first relevant hit, 0 if none in the top k.
- ``dcg`` / ``ndcg``: sum((2^rating − 1) / log2(rank + 1)) over the top
  k, unrated hits contributing 0; ndcg divides by the ideal DCG built
  from the request's OWN ratings sorted descending (top k) — the ES
  ``dcg`` metric with ``normalize: true``.
- ``err``: expected reciprocal rank, sum_r (1/r)·R_r·prod_{i<r}(1−R_i)
  with R = (2^rating − 1) / 2^max_relevance; ``max_relevance`` defaults
  to the highest rating in the request (ES requires it explicitly —
  the default is a convenience, documented).

Metric arithmetic runs on the driver over <= |requests|·k collected
rows — the same coordinator model as ES, which evaluates on the
coordinating node over the fetched top-k.
"""

from __future__ import annotations

import math

from .manifest import Manifest, load_manifest

METRICS = ("precision", "recall", "mrr", "dcg", "ndcg", "err")


def _metric_score(
    metric: str,
    ranked: list,  # [(key, rating_or_None)] in rank order, len <= k
    ratings: dict,
    k: int,
    relevant_threshold: int,
    ignore_unlabeled: bool,
    max_relevance: int,
) -> float:
    rel = [
        (r is not None and r >= relevant_threshold)
        for _, r in ranked
    ]
    if metric == "precision":
        denom = (
            sum(1 for _, r in ranked if r is not None)
            if ignore_unlabeled
            else len(ranked)
        )
        return (sum(rel) / denom) if denom else 0.0
    if metric == "recall":
        total = sum(1 for r in ratings.values() if r >= relevant_threshold)
        return (sum(rel) / total) if total else 0.0
    if metric == "mrr":
        for i, is_rel in enumerate(rel):
            if is_rel:
                return 1.0 / (i + 1)
        return 0.0
    if metric in ("dcg", "ndcg"):
        dcg = sum(
            (2.0 ** (r or 0) - 1.0) / math.log2(i + 2)
            for i, (_, r) in enumerate(ranked)
        )
        if metric == "dcg":
            return dcg
        ideal = sorted(ratings.values(), reverse=True)[:k]
        idcg = sum(
            (2.0 ** r - 1.0) / math.log2(i + 2) for i, r in enumerate(ideal)
        )
        return (dcg / idcg) if idcg > 0 else 0.0
    # err
    p_stop_prev = 1.0
    err = 0.0
    for i, (_, r) in enumerate(ranked):
        ri = (2.0 ** (r or 0) - 1.0) / (2.0 ** max_relevance)
        err += (1.0 / (i + 1)) * ri * p_stop_prev
        p_stop_prev *= 1.0 - ri
    return err


def rank_eval(
    spark,
    index_dir: str,
    requests: dict,
    key_col: str,
    metric: str = "ndcg",
    k: int = 10,
    relevant_threshold: int = 1,
    ignore_unlabeled: bool = False,
    max_relevance: int | None = None,
    scorer: str = "bm25",
    manifest: Manifest | None = None,
    default_fields: list[str] | None = None,
) -> dict:
    """Evaluate ranked search quality over rated requests.

    ``requests``: ``{request_id: (query, {key_value: rating})}`` —
    query is NQL or a programmatic object; ratings address docs by
    ``key_col`` (an identity/docmap column, the get_docs convention);
    ratings are non-negative ints, higher = more relevant.

    Returns the ES response shape::

        {"metric_score": <mean over requests>,
         "details": {request_id: {
             "score": float,
             "hits": [(key, rating_or_None), ...],   # rank order
             "unrated_docs": int,
         }}}
    """
    from pyspark.sql import functions as F

    from .query.exec import attach_docmap, search_many

    if metric not in METRICS:
        raise ValueError(f"metric must be one of {METRICS}, got {metric!r}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not requests:
        raise ValueError("rank_eval needs at least one request")
    for rid, (q, ratings) in requests.items():
        if not isinstance(ratings, dict) or not ratings:
            raise ValueError(f"request {rid!r} needs a non-empty ratings dict")
        if any((not isinstance(r, int)) or r < 0 for r in ratings.values()):
            raise ValueError(f"request {rid!r}: ratings are non-negative ints")
    if manifest is None:
        manifest = load_manifest(index_dir)

    queries = {rid: q for rid, (q, _) in requests.items()}
    many = search_many(
        spark, index_dir, queries, limit=k, scorer=scorer,
        manifest=manifest, default_fields=default_fields,
    )
    rows = (
        attach_docmap(spark, index_dir, many, manifest=manifest)
        .select("query_id", key_col, "score", "segment_ord", "doc")
        .collect()
    )
    by_rid: dict[str, list] = {rid: [] for rid in requests}
    for r in rows:
        by_rid[r["query_id"]].append(r)
    details = {}
    for rid, (q, ratings) in requests.items():
        hits = sorted(
            by_rid[rid], key=lambda r: (-r["score"], r["segment_ord"], r["doc"])
        )
        # ratings keys may be any type — compare through str() so long
        # vs int literals never silently miss (keys are identity values)
        smap = {str(key): rat for key, rat in ratings.items()}
        ranked = [(r[key_col], smap.get(str(r[key_col]))) for r in hits]
        mr = (
            max_relevance
            if max_relevance is not None
            else max(ratings.values()) if ratings else 1
        )
        score = _metric_score(
            metric, ranked, ratings, k, relevant_threshold,
            ignore_unlabeled, max(mr, 1),
        )
        details[rid] = {
            "score": score,
            "hits": ranked,
            "unrated_docs": sum(1 for _, rat in ranked if rat is None),
        }
    mean = sum(d["score"] for d in details.values()) / len(details)
    return {"metric_score": mean, "details": details}
