"""End-to-end training-data pipeline over a raw source tree.

Chains every plane of the engine on one corpus:

  1. ingest    — sources.load_source_tree (binaryFile scan -> corpus shape)
  2. quality   — textops.quality_scores + repetition_scores filters
  3. scrub     — textops.scrub_pii redaction
  3b. boilerplate — dedup.dedup_lines corpus-level exact-line removal
  3c. perplexity  — textops.unigram_lm/unigram_nll quality band
  4. dedup     — dedup.dup_clusters (MinHash-LSH -> components), keep keepers
  5. sample    — sampling.stratified_hash_sample by language
  6. chunk     — textops.chunk_tokens into training windows
  7. index     — build_index over the surviving docs; BM25 search over it

Run:  python examples/pipeline.py <source_tree_dir> <work_dir>
(or no args: builds a demo tree under /tmp). Every step is a DataFrame
transformation — the same script runs unchanged on a cluster via
spark-submit --py-files dist/ostrich_spark.zip.
"""

from __future__ import annotations

import os
import shutil
import sys

# allow running from a checkout without installing the package — the
# PYTHONPATH export reaches the executor-side python workers too (on a
# real cluster, ship dist/ostrich_spark.zip via --py-files instead)
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

from pyspark.sql import SparkSession, functions as F


def make_demo_tree(root: str) -> None:
    os.makedirs(f"{root}/src", exist_ok=True)
    footer = "# autogen: build-bot v1\n"
    files = {
        "src/engine.py": "def merge_policy(segments):\n    return sorted(segments)\n" * 3 + footer,
        "src/engine_copy.py": "def merge_policy(segments):\n    return sorted(segments)\n" * 3 + footer,
        "src/query.go": "package query\nfunc Search(term string) {}\n" + footer,
        "src/spam.txt": "buy buy buy buy buy buy buy buy buy buy buy buy\n",
        "src/notes.md": "indexing notes: postings are delta packed, contact admin@example.com\n",
    }
    for path, content in files.items():
        full = os.path.join(root, path)
        os.makedirs(os.path.dirname(full), exist_ok=True)
        with open(full, "w") as f:
            f.write(content)


def run_pipeline(spark, tree: str, work: str) -> dict:
    from ostrich_spark.build import build_index
    from ostrich_spark.dedup import dup_clusters
    from ostrich_spark.query.exec import attach_docmap, search
    from ostrich_spark.sampling import stratified_hash_sample
    from ostrich_spark.schema import Schema
    from ostrich_spark.sources import load_source_tree
    from ostrich_spark.textops import chunk_tokens, quality_scores, repetition_scores, scrub_pii

    stats = {}

    # 1. ingest
    corpus = load_source_tree(spark, tree).withColumn(
        "doc_id", F.xxhash64("repo", "path")
    )
    docs = corpus.select("doc_id", "path", "lang", F.col("content").alias("text"))
    stats["ingested"] = docs.count()

    # 2. quality filter: enough tokens, not dominated by one token
    q = quality_scores(docs).select("doc_id", "n_tokens")
    r = repetition_scores(docs).select("doc_id", "rep_ratio")
    keep_q = (
        docs.join(q, "doc_id").join(r, "doc_id")
        .filter((F.col("n_tokens") >= 5) & (F.col("rep_ratio") <= 0.5))
        .select("doc_id", "path", "lang", "text")
    )
    stats["after_quality"] = keep_q.count()

    # 3. PII scrub (keep redacted text)
    scrubbed = keep_q.join(scrub_pii(keep_q).select("doc_id", "scrubbed"), "doc_id").select(
        "doc_id", "path", "lang", F.col("scrubbed").alias("text")
    )
    stats["pii_redactions"] = int(
        scrub_pii(keep_q).agg(F.sum(F.col("n_email") + F.col("n_ip") + F.col("n_hex_secret")))
        .collect()[0][0] or 0
    )

    # 3b. corpus-level boilerplate removal: the build-bot footer lives in
    # three files -> its line df exceeds max_line_df=2 and it drops from
    # EVERY doc (the RefinedWeb exact-line rule); the engine.py /
    # engine_copy.py content lines sit at df=2 and survive
    from ostrich_spark.dedup import dedup_lines

    cleaned_lines = dedup_lines(scrubbed, max_line_df=2)
    stats["boilerplate_lines_dropped"] = int(
        cleaned_lines.agg(F.sum("n_dropped")).collect()[0][0] or 0
    )
    scrubbed = scrubbed.drop("text").join(
        cleaned_lines.select("doc_id", "text"), "doc_id"
    )

    # 3c. perplexity-proxy quality band: add-alpha unigram LM trained on
    # the corpus itself, docs scored by mean NLL -> exp(nll); a real
    # pipeline drops the tails, the demo records the band it would cut on
    from ostrich_spark.textops import unigram_lm, unigram_nll

    model, unk = unigram_lm(scrubbed)
    band = unigram_nll(scrubbed, model, unk).agg(
        F.min("ppl").alias("lo"), F.max("ppl").alias("hi")
    ).collect()[0]
    stats["ppl_band"] = (round(band["lo"], 2), round(band["hi"], 2))

    # 4. near-dup clustering -> keep one doc per cluster
    clusters = dup_clusters(scrubbed)
    keepers = scrubbed.join(
        clusters.filter("is_keeper").select("doc_id"), "doc_id"
    )
    stats["after_dedup"] = keepers.count()

    # 5. stratified sampling (here: keep everything, downweight nothing —
    # rates are the domain-mixing knob)
    sampled = stratified_hash_sample(
        keepers, {"python": 1.0, "go": 1.0, "markdown": 1.0, "text": 1.0}, default_rate=1.0
    )
    stats["after_sampling"] = sampled.count()

    # 6. chunk into training windows
    chunks = chunk_tokens(sampled, chunk_size=64, overlap=8)
    stats["chunks"] = chunks.count()

    # 7. index the surviving docs (positions -> phrases, store -> snippets,
    # numeric doc-value -> ranges/sorts/aggregations)
    schema = Schema()
    schema.add_text_field("text", "default", positions=True, store=True)
    schema.add_numeric_field("size_bytes")
    sampled = sampled.withColumn("size_bytes", F.length("text"))
    idx = os.path.join(work, "index")
    shutil.rmtree(idx, ignore_errors=True)
    from ostrich_spark.manifest import set_snapshot_retention

    set_snapshot_retention(idx, 4)  # keep commits readable point-in-time
    build_index(
        spark, sampled, schema, idx, num_partitions=2,
        order_col="path", id_cols=["path"], build_id="pipeline",
    )
    res, _ = search(spark, idx, "text:merge_policy OR text:postings", limit=5, scorer="bm25")
    hits = attach_docmap(spark, idx, res).select("path", "score").collect()
    stats["top_hits"] = [(h["path"], round(h["score"], 4)) for h in hits]

    # 8. phrase search over the positions-enabled index — plus the
    # autocomplete shape (phrase-prefix) and unordered NEAR
    ppres, _ = search(spark, idx, 'text:"delta pack*"', limit=5)
    stats["phrase_prefix_hits"] = ppres.count()
    nres, _ = search(spark, idx, 'text:"packed delta"~2u', limit=5)
    stats["near_unordered_hits"] = nres.count()
    pres, _ = search(spark, idx, 'text:"delta packed"', limit=5)
    stats["phrase_hits"] = [
        h["path"] for h in attach_docmap(spark, idx, pres).select("path").collect()
    ]

    # 8b. highlighted search results over the stored field
    from ostrich_spark.highlight import highlight

    snips = highlight(spark, idx, "text:postings", "text", limit=3, window_tokens=4)
    stats["snippets"] = [s.text for s in snips]

    # 8b2. "what makes these hits special" — significant_text over the
    # stored source of the match sample, with the duplicate-run filter:
    # the autogen build-bot footer (pasted into several files) counts
    # ONCE instead of once per doc, so it cannot fake significance
    from ostrich_spark.query.exec import significant_text

    sig = significant_text(
        spark, idx, "text:merge", "text",
        shard_size=None, significance="jlh", size=3,
    ).collect()
    stats["sig_text_top"] = [r["term"] for r in sig]

    # 8c. token budgeting with REAL merge-based BPE (pinned fixture table)
    from ostrich_spark.bpe import real_bpe_token_counts

    budget = real_bpe_token_counts(sampled).agg(
        F.sum("n_pieces").alias("p"), F.sum("n_bpe_tokens").alias("b")
    ).collect()[0]
    stats["token_budget"] = (int(budget["p"]), int(budget["b"]))

    # 8d. the whole query workload as ONE Spark job (batched serving shape)
    from ostrich_spark.query.exec import search_many

    batch = search_many(
        spark, idx,
        {"policy": "text:merge_policy", "pack": 'text:"delta packed"',
         "both": "text:merge_policy OR text:postings"},
        limit=3, scorer="bm25",
    )
    stats["batched_hits_per_query"] = {
        r["query_id"]: 1 for r in batch.select("query_id").distinct().collect()
    }

    # 8e. round-3 query surfaces: wildcard pattern, proximity phrase,
    # more-like-this, and a doc-value aggregation over a match set
    from ostrich_spark.query.exec import more_like_this, numeric_stats

    # ('_' is a token separator, so merge_policy indexes as merge+policy)
    wres, _ = search(spark, idx, "text:m?rge", limit=5)
    stats["wildcard_hits"] = wres.count()
    sres, _ = search(spark, idx, 'text:"delta packed"~2', limit=5)
    stats["sloppy_hits"] = sres.count()
    if stats["top_hits"]:
        seed_path = stats["top_hits"][0][0]
        seed_text = (
            sampled.filter(F.col("path") == seed_path).select("text").collect()[0][0]
        )
        mres, _ = more_like_this(
            spark, idx, "text", seed_text, max_query_terms=8, limit=3
        )
        stats["mlt_hits"] = [
            h["path"] for h in attach_docmap(spark, idx, mres).select("path").collect()
        ]
    size_row = numeric_stats(spark, idx, "text:postings", "size_bytes").collect()[0]
    stats["match_size_stats"] = (int(size_row["n"]), int(size_row["sum"]))

    # 8f. late-round-3 surfaces: did-you-mean, term facet, multi-field
    # dismax, per-doc explain, cursor paging, keyword extraction
    from ostrich_spark.manifest import load_manifest
    from ostrich_spark.query.exec import explain, significant_terms
    from ostrich_spark.query.expand import suggest_terms
    from ostrich_spark.query.parser import parse_multi_field
    from ostrich_spark.textops import keyterms

    mf = load_manifest(idx)
    stats["did_you_mean"] = [
        t for t, _, _ in suggest_terms(spark, idx, mf, 0, "postngs", max_dist=2)[:3]
    ]
    st = significant_terms(spark, idx, "text:postings", "text")
    stats["sig_terms"] = [
        r["term"]
        for r in st.orderBy(F.desc("n_docs"), F.asc("term")).limit(3).collect()
    ]
    dm = parse_multi_field("merge postings", mf.schema, ["text"], 0.3)
    dres, _ = search(spark, idx, dm, limit=3)
    rows = dres.collect()
    stats["dismax_hits"] = len(rows)
    if rows:
        top = rows[0]
        ex = explain(spark, idx, dm, top["segment_id"], top["doc"])
        stats["explained_score_matches"] = abs(ex["score"] - top["score"]) < 1e-9
        # cursor-page past the first hit (deep-page shape)
        last = rows[-1]
        page2, _ = search(
            spark, idx, dm, limit=3,
            after=(last["score"], last["segment_ord"], last["doc"]),
        )
        stats["cursor_page2_hits"] = page2.count()
    stats["keyterms_doc0"] = [
        r["term"] for r in keyterms(sampled.limit(3), "text", top_m=2).collect()
    ][:2]

    # 9. update lifecycle: upsert a corrected doc (new text replaces the
    # old immediately), then a takedown delete, then purge — and a final
    # integrity check over the surviving snapshot
    from ostrich_spark.check import check_index
    from ostrich_spark.deletes import delete_docs, update_docs
    from ostrich_spark.merge import purge_deletes

    if stats["top_hits"]:
        fix_path = stats["top_hits"][0][0]
        fixed = sampled.filter(F.col("path") == fix_path).withColumn(
            "text", F.lit("corrected contents merge_policy rewrite")
        ).withColumn("size_bytes", F.length("text"))
        n_replaced, _ = update_docs(
            spark, idx, fixed, ["path"], "pipeline-fix", num_partitions=1
        )
        stats["upserted"] = n_replaced
        victim = stats["top_hits"][-1][0]
        delete_docs(
            spark, idx, spark.createDataFrame([(victim,)], "path string"), ["path"]
        )
        _, n_before = search(spark, idx, "", limit=0, with_count=True)
        purge_deletes(spark, idx)
        _, n_after = search(spark, idx, "", limit=0, with_count=True)
        stats["after_takedown"] = (n_before, n_after)  # equal: purge is invisible

        # 10. operational surfaces: point-in-time read of the pre-takedown
        # commit, GET of the tombstoned doc as-of then (resurrects), and a
        # consistent hardlink clone of that snapshot
        from ostrich_spark.export import export_index
        from ostrich_spark.manifest import list_snapshots, load_manifest
        from ostrich_spark.query.exec import get_docs

        ops = [op for op, _ in list_snapshots(idx)]
        pre_takedown = load_manifest(idx, opstamp=ops[-3])  # before delete+purge
        stats["get_deleted_now"] = get_docs(spark, idx, [victim], "path").count()
        stats["get_deleted_at_snapshot"] = get_docs(
            spark, idx, [victim], "path", manifest=pre_takedown
        ).count()
        clone = os.path.join(work, "clone")
        shutil.rmtree(clone, ignore_errors=True)
        export_index(idx, clone, opstamp=ops[-3], hardlink=True)
        _, n_clone = search(spark, clone, "", limit=0, with_count=True)
        stats["clone_docs_pre_takedown"] = n_clone
        stats["fsck_findings"] = check_index(spark, idx)

    # 16. curation extras: decontamination vs a held-out 'benchmark'
    # slice, a weighted training mixture, per-bucket facet stats, and
    # index-decoded term vectors for the top hit
    from ostrich_spark.dedup import decontaminate
    from ostrich_spark.query.exec import facet_stats, term_vectors
    from ostrich_spark.sampling import mix_corpus

    bench = sampled.filter(F.col("doc_id") % 7 == 0).select("text")
    dec = decontaminate(sampled, bench, n=5)
    stats["contaminated"] = dec.filter("contaminated").count()
    weighted = sampled.withColumn("n_chars", F.length("text"))
    langs = [r["lang"] for r in weighted.select("lang").distinct().collect()]
    if len(langs) >= 2:
        mix = mix_corpus(
            weighted, {langs[0]: 0.5, langs[1]: 0.5},
            budget=weighted.agg(F.sum("n_chars")).collect()[0][0] // 2,
        )
        stats["mixture_rows"] = mix.count()
    fs = facet_stats(
        spark, idx, "text:def OR text:func", by=["lang"],
        metrics={"avg_sz": ("avg", "size_bytes")},
        join_df=sampled.select(F.col("path"), "lang"), join_on=["path"],
    )
    stats["facet_stats_buckets"] = fs.count()
    if stats["top_hits"]:
        tv = term_vectors(spark, idx, [stats["top_hits"][0][0]], "path", "text")
        stats["termvector_terms"] = tv.count()

    # 17. accretion shape: a data stream ingests the corpus in two
    # rollover generations (bounded per-index growth) yet searches as
    # ONE alias with summed global stats; retention prunes the oldest
    # generation once it ages out
    from ostrich_spark.datastream import (
        append as ds_append,
        create_stream,
        rollover,
        search_stream,
    )
    from ostrich_spark.schema import Schema as _S

    sd = os.path.join(work, "stream")
    shutil.rmtree(sd, ignore_errors=True)
    tpl = _S()
    tpl.add_text_field("text", "default")
    create_stream(sd, name="demo", schema=tpl)
    half = sampled.withColumn("doc_id", F.col("doc_id").cast("long"))
    ds_append(spark, half.filter("doc_id % 2 = 0"), None, sd,
              num_partitions=1, order_col="doc_id", id_cols=["doc_id"])
    rollover(sd, force=True)
    ds_append(spark, half.filter("doc_id % 2 = 1"), None, sd,
              num_partitions=1, order_col="doc_id", id_cols=["doc_id"])
    sres, n_stream = search_stream(spark, sd, "text:def", limit=5,
                                   with_count=True)
    stats["stream_hits"] = (sres.count(), n_stream)

    # 18. embedding economics: int8-quantized persisted ANN — candidate
    # scan over 1-byte codes (column pruning), float rescore for exact
    # top-k scores
    import numpy as np

    from ostrich_spark.similarity import ivf_build, ivf_search

    rng = np.random.RandomState(3)
    vecs = rng.normal(size=(64, 8))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(64)],
        "vec_id long, embedding array<double>",
    )
    ivf_q = os.path.join(work, "ivf_q")
    shutil.rmtree(ivf_q, ignore_errors=True)
    ivf_build(spark, emb, ivf_q, n_centroids=4, train_iters=2, quantize=True)
    hits = ivf_search(spark, ivf_q, [float(x) for x in vecs[0]], k=3,
                      nprobe=2, rescore_factor=4.0).collect()
    stats["ann_quantized_top"] = int(hits[0]["vec_id"])
    return stats


def main() -> int:
    tree = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pipeline_demo_tree"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/pipeline_demo_work"
    if len(sys.argv) <= 1:
        shutil.rmtree(tree, ignore_errors=True)
        make_demo_tree(tree)
    os.makedirs(work, exist_ok=True)
    spark = (
        SparkSession.builder.master(os.environ.get("PIPELINE_MASTER", "local[4]"))
        .appName("ostrich-pipeline-demo")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    stats = run_pipeline(spark, tree, work)
    for k, v in stats.items():
        print(f"{k}: {v}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
