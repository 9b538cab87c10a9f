"""Benchmark harness — prints ONE JSON line.

Headline metrics (north rule: indexing throughput in files/sec + BM25
top-10 query latency, with the engine's own merge/WAND/compression on):

1. index build: deterministic synthetic source-code corpus (FIXTURES.md
   §1/§6: seed=42), one segment per partition, full pipeline (tokenize ->
   postings -> delta+varint pack -> norms -> docmap -> checkpointed
   segment write -> manifest commit). files/sec reported.
2. query latency: the reference query set (FIXTURES.md §3) + BM25 WAND
   top-10, each timed end-to-end (plan + stats binding + pruned scan +
   per-segment scoring + global merge).
3. training-data ops on the driver testdata (documents/embeddings at
   $SPARK_GRAFT_SF_DIR): BM25 top-k via the real index, minhash
   signatures, simhash, ANN cosine top-k.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), BENCH_ROWS (default 60000),
BENCH_MODE=full|build_only.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
ROWS = int(os.environ.get("BENCH_ROWS", "60000"))
MODE = os.environ.get("BENCH_MODE", "full")
# SPARK_GRAFT_MASTER: "" (default) -> local[CPUS]; "submit" -> do NOT set a
# master, inherit it from spark-submit (the local-cluster / real-cluster
# deployment shape: `spark-submit --master local-cluster[2,8,8192]
# --py-files dist/ostrich_spark.zip bench.py`); any other value -> used
# verbatim as the master URL.
MASTER = os.environ.get("SPARK_GRAFT_MASTER", "")

BENCH_QUERIES = [
    ("term_common", "content:merge_policy", "tfidf", 10),
    ("term_rare", "content:rareterm007", "tfidf", 10),
    ("and_rare_common", "content:rareterm007 AND content:the", "tfidf", 10),
    ("or_fanout", "content:search OR content:index OR content:query OR content:term", "tfidf", 10),
    ("nested_bool", "(content:func OR content:def) AND (content:search or content:index)", "tfidf", 10),
    ("bm25_wand_topk", "content:the OR content:rareterm007", "bm25", 10),
    ("bm25_or_fanout", "content:search OR content:index OR content:query", "bm25", 10),
    # multi-term expansion paths: dictionary range-read + union scoring
    ("prefix_topk", "content:se*", "tfidf", 10),
    ("fuzzy_topk", "content:search~1", "bm25", 10),
    # numeric doc-value paths: pure range = pushed-down docmap scan;
    # composite = range match set riding the scoring shuffle (aux cogroup)
    ("range_pure", "size_bytes:[1000 TO 1500]", "tfidf", 10),
    ("range_and_term", "content:search AND size_bytes:[500 TO 1500]", "tfidf", 10),
    # keyword doc-value paths: pure eq = pushed-down docmap scan;
    # composite = keyword match set riding the scoring shuffle
    ("keyword_pure", "lang:go", "tfidf", 10),
    ("keyword_and_term", "content:search AND lang:go", "bm25", 10),
    # lexicographic keyword range: pushed-down string-interval docmap scan
    ("keyword_range", "content:search AND lang:[go TO py]", "tfidf", 10),
]


def main():
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from ostrich_spark.build import build_index
    from ostrich_spark.corpus import make_corpus
    from ostrich_spark.query.exec import search
    from ostrich_spark.schema import Schema

    builder = SparkSession.builder
    if MASTER != "submit":
        builder = builder.master(MASTER or f"local[{CPUS}]")
    spark = (
        builder
        .appName(f"ostrich-bench-{CPUS}")
        .config("spark.sql.shuffle.partitions", str(max(CPUS, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}

    # --- 1. index build throughput --------------------------------------
    # The corpus lands on disk and Spark READS it — the real ingest shape
    # (a cluster reads the source table; it never parallelizes driver
    # memory). createDataFrame(pdf) shipped the whole frame inside task
    # closures, which local mode hides but a real cluster rejects: at
    # 240k rows the serialized task is 188MB > spark.rpc.message.maxSize
    # (found by the local-cluster[1,2,4096] scaling run).
    corpus_path = f"/tmp/ostrich_bench_corpus_{ROWS}"
    if not os.path.exists(os.path.join(corpus_path, "_DONE")):
        import pyarrow as pa
        import pyarrow.parquet as pq

        shutil.rmtree(corpus_path, ignore_errors=True)
        os.makedirs(corpus_path)
        pq.write_table(
            pa.Table.from_pandas(make_corpus(ROWS, seed=42)),
            os.path.join(corpus_path, "corpus.parquet"),
        )
        open(os.path.join(corpus_path, "_DONE"), "w").close()
    corpus = spark.read.parquet(corpus_path).repartition(32).cache()
    n_files = corpus.count()  # materialize so build timing excludes gen

    # warm the Python workers (import numpy/pandas once per executor
    # slot) — on a real cluster workers are long-lived and reused; we
    # measure throughput, not interpreter cold-start
    import pandas as _pd

    def _noop(it):
        for b in it:
            yield _pd.DataFrame({"n": [len(b)]})

    corpus.mapInPandas(_noop, "n long").count()

    # Partition count: one fat task per EFFECTIVE core. This sandbox
    # advertises 32 vCPUs but sustains ~16 concurrent python workers
    # before thrashing (see BENCH/BASELINE.md caveat); on a real cluster
    # this is the spark.sql.files.maxPartitionBytes knob, not a constant.
    # constant across parallelism levels so the scaling runs compare the
    # IDENTICAL job (16 tasks, 2-at-a-time on local[2] vs 16-at-a-time)
    nparts = int(os.environ.get("BENCH_PARTITIONS", "16"))
    idx = f"/tmp/ostrich_bench_idx_{CPUS}_{ROWS}"
    corpus = corpus.withColumn("size_bytes", F.length("content"))
    schema = Schema()
    schema.add_text_field("content", "default")
    schema.add_numeric_field("size_bytes")
    schema.add_keyword_field("lang")
    # steady-state throughput: first build pays JVM JIT + arrow codegen
    # warmup (long-lived executors on a real cluster amortize this);
    # report the warm second build, record the cold one alongside.
    shutil.rmtree(idx, ignore_errors=True)
    t0 = time.time()
    build_index(
        spark, corpus, schema, idx, num_partitions=nparts,
        order_col="path", id_cols=["path"], build_id="bench",
    )
    timings["index_build_cold"] = round(time.time() - t0, 3)
    shutil.rmtree(idx, ignore_errors=True)
    t0 = time.time()
    manifest = build_index(
        spark, corpus, schema, idx, num_partitions=nparts,
        order_col="path", id_cols=["path"], build_id="bench",
    )
    build_sec = time.time() - t0
    timings["index_build"] = round(build_sec, 3)
    phases = manifest.stats.get("build_phases", {})
    timings["build_map_sec"] = phases.get("map_sec", 0.0)
    timings["build_commit_sec"] = phases.get("commit_sec", 0.0)
    files_per_sec = n_files / build_sec

    result = {
        "metric": "index files/sec + query latency (sec)",
        "unit": "sec",
        "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
        "cpus": CPUS,
        "bench_rows": n_files,
        "files_per_sec": round(files_per_sec, 1),
        "total_docs": manifest.total_docs,
    }

    if MODE == "build_only":
        result["value"] = timings["index_build"]
        result["queries"] = timings
        print(json.dumps(result))
        spark.stop()
        return

    # --- 2. query latency on the built index ----------------------------
    # one warmup to spin up python workers / file index, then a cold pass
    # + BEST-OF-3 timed runs per query (this host shows ±60% run noise,
    # BENCH/BASELINE.md — a single sample measures the scheduler lottery,
    # not the engine)
    search(spark, idx, "content:search", limit=10)[0].collect()
    cold_total = 0.0
    for name, q, scorer, k in BENCH_QUERIES:
        t0 = time.time()
        search(spark, idx, q, limit=k, scorer=scorer)[0].collect()
        cold_total += time.time() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            res, _ = search(spark, idx, q, limit=k, scorer=scorer)
            res.collect()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
    timings["queries_cold_total"] = round(cold_total, 3)
    timings["queries_individual_total"] = round(
        sum(timings[name] for name, *_ in BENCH_QUERIES), 3
    )

    # batched execution: the ENTIRE reference query set as ONE Spark job
    # (search_many) — amortizes the per-job scheduling floor that
    # dominates every individual latency above. Target (r2 verdict):
    # <= 0.5x the sum of individual timings.
    from ostrich_spark.query.exec import search_many

    batch_q = {name: q for name, q, _, _ in BENCH_QUERIES}
    batch_scorers = {name: scorer for name, _, scorer, _ in BENCH_QUERIES}
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        search_many(
            spark, idx, batch_q, limit=10, scorers=batch_scorers
        ).collect()
        best = min(best, time.time() - t0)
    timings["batched_queries"] = round(best, 3)

    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        _, cnt = search(spark, idx, "content:search OR content:index", limit=0, with_count=True)
        best = min(best, time.time() - t0)
    timings["count_collector"] = round(best, 3)

    # deep paging: offset makes every segment return offset+limit rows;
    # the search_after cursor filters BEFORE the local top-k so the deep
    # page stays a k-per-segment job (page ~1000 at page-1 cost)
    deep_q = "content:the"
    probe, _ = search(spark, idx, deep_q, limit=1000, use_wand=False)
    last = probe.collect()[-1]
    cursor = (last["score"], last["segment_ord"], last["doc"])
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        search(spark, idx, deep_q, limit=10, offset=1000)[0].collect()
        best = min(best, time.time() - t0)
    timings["page_deep_offset"] = round(best, 3)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        search(spark, idx, deep_q, limit=10, after=cursor)[0].collect()
        best = min(best, time.time() - t0)
    timings["page_deep_cursor"] = round(best, 3)

    # term-level facet: full-postings cogroup against an exhaustive
    # match set (the heaviest analytic query shape)
    from ostrich_spark.query.exec import significant_terms

    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        significant_terms(spark, idx, "content:search", "content").collect()
        best = min(best, time.time() - t0)
    timings["sig_terms"] = round(best, 3)

    # did-you-mean over the whole dictionary (distributed JVM levenshtein)
    from ostrich_spark.manifest import load_manifest as _lm
    from ostrich_spark.query.expand import suggest_terms

    _mf = _lm(idx)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        suggest_terms(spark, idx, _mf, 0, "serach", max_dist=2, prefix_length=0)
        best = min(best, time.time() - t0)
    timings["suggest_wholedict"] = round(best, 3)

    # --- 3. training-data ops on the driver testdata ---------------------
    import __spark_entry__ as em

    for name, fn in [
        ("docs_bm25_topk", em.queries()["eng_bm25_topk"]),
        ("docs_phrase_tfidf", em.queries()["eng_phrase_tfidf"]),
        ("docs_phrase_sloppy", em.queries()["eng_phrase_sloppy"]),
        ("docs_phrase_prefix", em.queries()["eng_phrase_prefix"]),
        ("docs_near_unordered", em.queries()["eng_near_unordered"]),
        ("docs_more_like_this", em.queries()["eng_more_like_this"]),
        ("docs_collapse_lang", em.queries()["eng_collapse_lang"]),
        ("docs_grouped_topn", em.queries()["eng_grouped_topn"]),
        ("docs_rescore_phrase", em.queries()["eng_rescore_phrase"]),
        ("percolate_4q", em.queries()["perc_match"]),
        ("docs_cross_fields", em.queries()["eng_cross_fields"]),
        ("agg_filters", em.queries()["eng_filters_agg"]),
        ("agg_range", em.queries()["eng_range_agg"]),
        ("agg_geo_rings", em.queries()["eng_geo_rings"]),
        ("agg_mad", em.queries()["eng_mad"]),
        ("agg_facet_ergo", em.queries()["eng_facet_ergo"]),
        ("agg_nested", em.queries()["eng_nested_agg"]),
        ("decontam_ngrams", em.queries()["decontam_ngrams"]),
        ("sample_mixture", em.queries()["sample_mixture"]),
        ("pack_sequences", em.queries()["text_pack_sequences"]),
        ("dedup_minhash_sigs", em.queries()["dedup_minhash_sigs"]),
        ("dedup_simhash", em.queries()["dedup_simhash"]),
        ("ann_cosine_topk", em.queries()["ann_cosine_topk"]),
        ("hybrid_rrf", em.queries()["eng_hybrid_rrf"]),
        ("ann_filtered", em.queries()["eng_filtered_ann"]),
        ("ann_sq_topk", em.queries()["eng_sq_topk"]),
        ("docs_span_not", em.queries()["eng_span_not"]),
        ("docs_span_within", em.queries()["eng_span_within"]),
        ("docs_span_or", em.queries()["eng_span_or"]),
        # BM25F over text + text2^2: norms of BOTH fields ride the aux
        # cogroup beside the postings — the heaviest per-term delivery
        ("docs_combined_fields", em.queries()["eng_combined_fields"]),
        ("agg_facet_pctl", em.queries()["eng_facet_pctl"]),
        # first run builds the 2-generation stream (cached dir); best-of-3
        # keeps the warm searches like every other entry
        ("stream_search", em.queries()["eng_stream_search"]),
        ("text_unigram_nll", em.queries()["text_unigram_nll"]),
        # rebuilt text is corpus-sized: count(), like chunks/scrub
        ("dedup_lines", em.queries()["dedup_lines"]),
        ("text_chunks", em.queries()["text_chunks"]),
        ("scrub_pii", em.queries()["scrub_pii"]),
        ("sample_stratified", em.queries()["sample_stratified"]),
        # round-3 late additions: stored-text re-analysis (sig_text),
        # DP clustering over the value summary (vw_hist), first-seen
        # cumulative distinct (cum_card), relation-bucket semi-join
        # (children agg), identity IN filter (ids)
        ("agg_sig_text", em.queries()["eng_sig_text"]),
        ("agg_vw_hist", em.queries()["eng_vw_hist"]),
        ("agg_cum_card", em.queries()["eng_cum_card"]),
        ("agg_children", em.queries()["eng_children_agg"]),
        ("docs_ids_filter", em.queries()["eng_ids_filter"]),
        ("docs_copy_to", em.queries()["eng_copy_to"]),
        # round-3 session-6: query-driven in-place rewrite (first run
        # pays the side-index build + purge; best-of-3 keeps the warm
        # search), noisy-channel phrase suggester (pruned candidate
        # reads + LM point lookups + driver Viterbi), MI significance,
        # date_range buckets, length->unique analyzer chain
        ("docs_update_by_query", em.queries()["eng_update_by_query"]),
        ("suggest_phrase", em.queries()["eng_phrase_suggest"]),
        ("agg_sig_mi", em.queries()["eng_sig_mi"]),
        ("agg_date_range", em.queries()["eng_date_range"]),
        ("analysis_length_unique", em.queries()["a10_length_unique_tf"]),
        ("sample_cap_per_source", em.queries()["sample_cap_per_source"]),
        ("emb_semantic_dedup", em.queries()["emb_semantic_dedup"]),
        # round-3 session-7: geo percolation (three broadcast joins over
        # the parsed doc points), ip field surface (CIDR filter beside
        # scored text / declared ip_range buckets / address-order top-k;
        # first run pays the ip index build, best-of-3 keeps warm reads)
        ("perc_geo", em.queries()["perc_geo"]),
        ("docs_ip_cidr", em.queries()["eng_ip_cidr"]),
        ("agg_ip_range", em.queries()["eng_ip_range_agg"]),
        ("docs_ip_sorted", em.queries()["eng_ip_sorted"]),
        # round-3 session-8: per-bucket top-k docs/metrics (skew-safe
        # pre-prune + bounded window)
        ("agg_top_hits", em.queries()["eng_top_hits"]),
        ("agg_top_metrics", em.queries()["eng_top_metrics"]),
        ("dict_terms_enum", em.queries()["eng_terms_enum"]),
        ("agg_random_sampler", em.queries()["eng_random_sampler"]),
        ("agg_freq_itemsets", em.queries()["eng_freq_itemsets"]),
        ("agg_categorize", em.queries()["eng_categorize"]),
        ("agg_geo_line", em.queries()["eng_geo_line"]),
        ("docs_rangef_intersects", em.queries()["eng_rangef_intersects"]),
        ("agg_hist_stats", em.queries()["eng_hist_stats"]),
        ("agg_hist_pctl", em.queries()["eng_hist_pctl"]),
        ("docs_scroll_pages", em.queries()["eng_scroll_pages"]),
        ("docs_terms_lookup", em.queries()["eng_terms_lookup"]),
        ("text_clf_score", em.queries()["text_clf_score"]),
        ("text_c4_clean", em.queries()["text_c4_clean"]),
        ("hybrid_linear", em.queries()["eng_linear_fuse"]),
        ("events_downsample", em.queries()["events_downsample"]),
        ("dedup_repeated_spans", em.queries()["dedup_repeated_spans"]),
        ("agg_change_point", em.queries()["eng_change_point"]),
        ("sample_weighted", em.queries()["sample_weighted"]),
        ("mm_image_dhash", em.queries()["mm_image_dhash"]),
        ("agg_ip_prefix", em.queries()["eng_ip_prefix"]),
        # round-5: PQ/ADC — fit+encode+LUT scan end to end (the m-byte
        # code scan is the 100TB path; this times the whole pipeline)
        ("ann_pq_adc_topk", em.queries()["emb_pq_adc_topk"]),
        # corpus-sized output: count()-timed (the trainer-feed reshuffle)
        ("sample_epoch_shuffle", em.queries()["sample_epoch_shuffle"]),
        ("sample_token_budget", em.queries()["sample_token_budget"]),
    ]:
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            # text-heavy ops (chunks/scrub) would ship the whole corpus text
            # to the driver under collect() — time the compute via count()
            if name in ("text_chunks", "scrub_pii", "dedup_lines",
                        "text_c4_clean", "dedup_repeated_spans",
                        "sample_epoch_shuffle"):
                fn(spark, SF_DIR).count()
            else:
                fn(spark, SF_DIR).collect()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    # persisted IVF: one-time build (info key), then the partition-pruned
    # search — the repeated-query scale path (nprobe/C of the corpus)
    from ostrich_spark.similarity import ivf_build, ivf_search

    emb_df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qv = em._query_vec(spark, SF_DIR)
    ivf_path = f"/tmp/ostrich_bench_ivf_{CPUS}"
    shutil.rmtree(ivf_path, ignore_errors=True)
    t0 = time.time()
    ivf_build(spark, emb_df, ivf_path, n_centroids=8, train_iters=3)
    timings["ivf_build_sec"] = round(time.time() - t0, 3)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        ivf_search(spark, ivf_path, qv, k=10, nprobe=1).collect()
        best = min(best, time.time() - t0)
    timings["ann_ivf_persisted_topk"] = round(best, 3)
    # library defaults (64 planes / 8-bit bands) — the gate entry pins a
    # coarser 16/4 config for oracle parity, which candidate-explodes at
    # this corpus size and would measure the wrong thing
    from ostrich_spark.similarity import neardup_pairs_lsh

    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        neardup_pairs_lsh(emb_df, threshold=0.9).count()
        best = min(best, time.time() - t0)
    timings["emb_neardup_lsh"] = round(best, 3)

    # headline value: warm build + all query/op timings. The info-only
    # keys (cold build, build phase split, one-time ivf build) would
    # double/triple-count if summed — keep them out of the longitudinal
    # metric.
    info_keys = {
        "index_build_cold",
        "build_map_sec",
        "build_commit_sec",
        "ivf_build_sec",
        "queries_individual_total",  # sum of entries already counted
    }
    result["value"] = round(sum(v for k, v in timings.items() if k not in info_keys), 3)
    result["queries"] = timings
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
