"""Query-latency weak-scaling ladder (the READ-path analog of
tools/ladder.py's build ladder — r3 verdict task #2): per-query latency
and WAND block-skip ratios at growing corpus sizes with constant
docs/partition, so the rungs measure how per-segment parallel search
(reference analog: /root/reference/reader/search.go:34-55) holds as the
corpus scales.

Reuses the build ladder's corpus at /tmp/ladder_corpus_{n} (generated
distributed if missing) but builds its OWN index at /tmp/ladder_qidx_{n}
— positions=True (phrase rung) + a lang keyword field (facet rung).

Timed per rung (best-of-3 after one warmup):
  term_topk   content:merge_policy            tfidf  top-10
  wand_or     content:the OR content:rareterm007  bm25 top-10 (the WAND shape)
  and_query   content:merge_policy AND content:search  tfidf top-10
  phrase      content:"merge_policy merge_policy"      bm25 top-10
  facet_lang  facet over lang on content:search's full match set
  many8       search_many batch of 8 mixed queries (one job)

Block-skip probe: per segment, the wand_or posting rows are read
driver-side (pyarrow term pushdown) and wand_union_topk runs with its
stats dict — summed blocks_total/blocks_kept across segments is exactly
what the distributed tasks decode (same kernel, same per-segment
threshold semantics).

Usage: python tools/ladder_query.py [n_files] [cpus] [nparts]
  (docs/partition pinned at 15000 unless nparts is given; default cpus 16)

The optional ``nparts`` override is the CONSTANT-PARTITION ladder (r4
verdict task #4): hold the partition count at e.g. 16 (== cpus, so every
rung runs in exactly ONE task wave) and grow docs/partition instead.
The weak-scaling rungs (constant docs/partition, growing partitions)
attribute their residual latency growth to task waves (256 partitions /
16 cores = 16 waves); this mode isolates per-wave cost — if latency
tracks docs/partition ~linearly at a fixed single wave, the wave count
is indeed the residual, and a real cluster holding docs/partition
constant with enough executors (1 wave) stays flat."""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ladder import CHUNK, gen_corpus  # noqa: E402  (tools/ladder.py)

QUERIES = [
    ("term_topk", "content:merge_policy", "tfidf"),
    ("wand_or", "content:the OR content:rareterm007", "bm25"),
    ("and_query", "content:merge_policy AND content:search", "tfidf"),
    ("phrase", 'content:"merge_policy merge_policy"', "bm25"),
]
MANY8 = {
    "m1": "content:merge_policy",
    "m2": "content:the OR content:rareterm007",
    "m3": "content:search AND content:index",
    "m4": "content:rareterm007",
    "m5": "content:func OR content:def",
    "m6": "content:query",
    "m7": "content:postings_list",
    "m8": "content:search OR content:index OR content:term",
}


def block_probe(spark, index_dir: str, query: str, scorer: str,
                k: int = 10) -> dict:
    """Driver-side per-segment WAND stats for an OR-of-terms query:
    same kernel (wand_union_topk) + same per-segment threshold
    semantics as the distributed tasks."""
    import pyarrow.compute as pc
    import pyarrow.dataset as ds

    from ostrich_spark.manifest import load_manifest
    from ostrich_spark.query.exec_core import (
        TermPostings,
        bind_stats,
        is_wire_term_union,
        wand_union_topk,
    )
    from ostrich_spark.query.parser import parse_query
    from ostrich_spark.query.plan import collect_terms, compile_query, to_wire

    manifest = load_manifest(index_dir)
    logical = parse_query(query, manifest.schema, None, "or")
    terms = collect_terms(logical)
    term_strs = [t.term for t in terms]

    doc_freqs, total_docs, field_avgdl = bind_stats(
        spark, index_dir, manifest, logical
    )
    compiled = compile_query(logical, doc_freqs, total_docs, field_avgdl, scorer)
    wire = to_wire(compiled)
    if not is_wire_term_union(wire):
        raise ValueError(f"block probe wants an OR-of-terms query: {query}")
    tw = wire["children"] if wire["kind"] == "or" else [wire]

    stats = {"blocks_total": 0, "blocks_kept": 0}

    for seg in manifest.sorted_segments():
        pth = os.path.join(index_dir, "segments", seg.segment_id,
                           "postings.parquet")
        sd = ds.dataset(pth, format="parquet")
        st = sd.to_table(filter=pc.field("term").isin(term_strs))
        pdf = st.to_pandas()
        if not len(pdf):
            continue
        term_data = {
            (int(f), t): TermPostings(rows)
            for (f, t), rows in pdf.groupby(["field", "term"])
        }
        wand_union_topk(tw, term_data, k, scorer, stats=stats)
    return stats


def phrase_probe(spark, index_dir: str, query: str) -> dict:
    """Per-segment eval_phrase with the wire's pos_aligned stamp, summing
    TermPostings position-block counters — the same kernel + candidate
    pruning the distributed tasks run."""
    import pyarrow.compute as pc
    import pyarrow.dataset as ds

    from ostrich_spark.manifest import load_manifest
    from ostrich_spark.query.exec_core import (
        TermPostings,
        bind_stats,
        eval_phrase,
    )
    from ostrich_spark.query.parser import parse_query
    from ostrich_spark.query.plan import collect_terms, compile_query, to_wire

    manifest = load_manifest(index_dir)
    if manifest.stats.get("pos_layout") != "doc_aligned":
        return {"total": 0, "decoded": 0}
    logical = parse_query(query, manifest.schema, None, "or")
    term_strs = [t.term for t in collect_terms(logical)]
    doc_freqs, total_docs, field_avgdl = bind_stats(
        spark, index_dir, manifest, logical
    )
    wire = to_wire(
        compile_query(logical, doc_freqs, total_docs, field_avgdl, "bm25")
    )
    assert wire["kind"] in ("phrase", "multi_phrase"), wire["kind"]
    wire["pos_aligned"] = True
    total = decoded = 0
    for seg in manifest.sorted_segments():
        pth = os.path.join(index_dir, "segments", seg.segment_id,
                           "postings.parquet")
        st = ds.dataset(pth, format="parquet").to_table(
            filter=pc.field("term").isin(term_strs)
        )
        pdf = st.to_pandas()
        if not len(pdf):
            continue
        term_data = {
            (int(f), t): TermPostings(rows)
            for (f, t), rows in pdf.groupby(["field", "term"])
        }
        eval_phrase(wire, term_data, "bm25")
        for tp in term_data.values():
            total += tp.pos_blocks_total
            decoded += tp.pos_blocks_decoded
    return {"total": total, "decoded": decoded}


def main():
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 240_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    nparts = int(sys.argv[3]) if len(sys.argv) > 3 else n_files // CHUNK

    from pyspark.sql import SparkSession

    from ostrich_spark.build import build_index
    from ostrich_spark.query.exec import facet_counts, search, search_many
    from ostrich_spark.schema import Schema

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"ostrich-qladder-{n_files}")
        .config("spark.sql.shuffle.partitions", str(max(cpus * 4, 32)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    corpus_path = f"/tmp/ladder_corpus_{n_files}"
    if not os.path.exists(corpus_path):
        gen_sec = gen_corpus(spark, n_files, corpus_path)
        print(f"corpus gen: {gen_sec:.1f}s -> {corpus_path}")
    corpus = spark.read.parquet(corpus_path)

    idx = (
        f"/tmp/ladder_qidx_{n_files}"
        if len(sys.argv) <= 3
        else f"/tmp/ladder_qidx_{n_files}_p{nparts}"
    )
    if not os.path.exists(os.path.join(idx, "manifest.json")):
        schema = Schema()
        schema.add_text_field("content", "default", positions=True)
        schema.add_keyword_field("lang")
        shutil.rmtree(idx, ignore_errors=True)
        t0 = time.time()
        build_index(
            spark, corpus, schema, idx,
            num_partitions=nparts, order_col="path", id_cols=["path"],
            build_id="qladder",
        )
        print(f"index build (positions=True): {time.time() - t0:.1f}s")

    # warmup (JIT / arrow / py4j; long-lived executors amortize this)
    search(spark, idx, "content:search", limit=10)[0].collect()

    results = {}
    for name, q, scorer in QUERIES:
        best = None
        for _ in range(3):
            t0 = time.time()
            rows = search(spark, idx, q, limit=10, scorer=scorer)[0].collect()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        results[name] = round(best, 3)
        print(f"{name}: {best:.3f}s ({len(rows)} rows)")

    best = None
    for _ in range(3):
        t0 = time.time()
        facet_counts(spark, idx, "content:search", "lang").collect()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    results["facet_lang"] = round(best, 3)
    print(f"facet_lang: {best:.3f}s")

    best = None
    for _ in range(3):
        t0 = time.time()
        search_many(spark, idx, MANY8, limit=10, scorer="bm25").collect()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    results["many8"] = round(best, 3)
    print(f"many8 (8 queries, one job): {best:.3f}s")

    # phrase position-block probe: rare-seeded candidate pruning on the
    # doc-aligned layout — how many of the common term's position blocks
    # the phrase evaluator actually decodes. The corpus plants the
    # adjacency "rareterm000 merge_policy" in docs with j%1500==0
    # (corpus.make_corpus extras), so the rare slot seeds candidates
    # and merge_policy (1/3 of all docs) is the prunable hot side.
    pst = phrase_probe(spark, idx, 'content:"rareterm000 merge_policy"')
    pskip = 1.0 - pst["decoded"] / max(pst["total"], 1)
    results["phrase_pos_blocks_total"] = pst["total"]
    results["phrase_pos_blocks_decoded"] = pst["decoded"]
    results["phrase_pos_block_skip"] = round(pskip, 4)
    print(
        f"phrase pos-block probe: {pst['decoded']}/{pst['total']} "
        f"position blocks decoded ({pskip:.1%} skipped)"
    )

    st = block_probe(spark, idx, "content:the OR content:rareterm007", "bm25")
    skip = 1.0 - st["blocks_kept"] / max(st["blocks_total"], 1)
    results["wand_blocks_total"] = st["blocks_total"]
    results["wand_blocks_kept"] = st["blocks_kept"]
    results["wand_block_skip"] = round(skip, 4)
    print(
        f"wand block probe: {st['blocks_kept']}/{st['blocks_total']} "
        f"blocks decoded ({skip:.1%} skipped)"
    )

    print(json.dumps({
        "n_files": n_files, "cpus": cpus, "nparts": nparts, **results
    }))
    spark.stop()


if __name__ == "__main__":
    main()
