"""CLI output contract (D10) + physical-plan regression guards."""

import subprocess
import sys

import pytest

from ostrich_spark.build import build_index
from ostrich_spark.corpus import make_corpus
from ostrich_spark.schema import Schema


@pytest.fixture(scope="module")
def small_index(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    idx = str(tmp / "idx")
    pdf = make_corpus(120, seed=3)
    schema = Schema()
    schema.add_text_field("content", "default")
    build_index(
        spark, spark.createDataFrame(pdf), schema, idx,
        num_partitions=3, order_col="path", id_cols=["path"], build_id="cli",
    )
    return idx


def test_cli_search_output_contract(small_index):
    """cmd/ostrich/cmd/search.go prints 'docAddress score' lines + elapsed."""
    out = subprocess.run(
        [sys.executable, "-m", "ostrich_spark", "search", "content:merge_policy",
         "-p", small_index, "-l", "3", "--scorer", "tfidf", "--count"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.strip()]
    hit_lines = [l for l in lines if "/" in l and not l.startswith(("count", "elapsed"))]
    assert 1 <= len(hit_lines) <= 3
    for l in hit_lines:
        addr, score = l.split()
        seg, doc = addr.split("/")
        int(seg), int(doc), float(score)
    assert any(l.startswith("count:") for l in lines)
    assert any(l.startswith("elapsed:") for l in lines)


def test_cli_facet_docmap_column(small_index):
    """facet over a docmap identity column prints 'value n_docs' lines."""
    out = subprocess.run(
        [sys.executable, "-m", "ostrich_spark", "facet", "content:merge_policy",
         "-p", small_index, "--by", "path"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.strip() and not l.startswith("elapsed")]
    assert lines, out.stdout
    for l in lines:
        # every matching doc is its own path -> each facet row counts 1
        assert l.endswith(" 1")


def test_cli_search_prefix_syntax(small_index):
    """multi-term NQL reaches the CLI unchanged: content:merge* matches
    at least as many docs as the exact term."""
    run = lambda q: subprocess.run(
        [sys.executable, "-m", "ostrich_spark", "search", q, "-p", small_index,
         "-l", "100", "--scorer", "tfidf", "--count"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    o1, o2 = run("content:merge*"), run("content:merge")
    assert o1.returncode == 0 and o2.returncode == 0, (o1.stderr[-1000:], o2.stderr[-1000:])
    cnt = lambda o: int(
        next(l for l in o.stdout.splitlines() if l.startswith("count:")).split()[1]
    )
    assert cnt(o1) >= cnt(o2) > 0


def test_term_lookup_pushdown(spark, small_index):
    """The (field, term) predicate must reach the parquet scan and the
    scan must prune to the stats columns — SURVEY.md §4 'what Catalyst
    gives us for free' made into a regression test."""
    from pyspark.sql import functions as F

    from ostrich_spark.query.exec import POSTINGS_SPARK_SCHEMA, _postings_glob

    df = (
        spark.read.schema(POSTINGS_SPARK_SCHEMA)
        .parquet(_postings_glob(small_index))
        .filter((F.col("field") == 0) & (F.col("term") == "merge_policy"))
        .select("segment_id", "doc_freq")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "EqualTo(term,merge_policy)" in plan
    # column pruning: packed blobs must NOT be read for a stats lookup
    assert "docs" not in plan.split("ReadSchema")[1].split("\n")[0]


def test_global_topk_is_take_ordered(spark, small_index):
    """Global merge = orderBy(...).limit(k) must compile to
    TakeOrderedAndProject (the reference's MergeResults heap, C2)."""
    from ostrich_spark.query.exec import search

    res, _ = search(spark, small_index, "content:merge_policy", limit=5)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_sketch_plans_have_no_serial_stage(spark):
    """Regression guard for the sketch-operator redesign: minhash /
    simhash / fingerprint must compile WITHOUT a global window or a
    single-partition exchange (the old dense-rank vocabulary forced
    Exchange SinglePartition + Window — a serial bottleneck), and with
    exactly one wide exchange (the groupBy(doc_id) partial agg)."""
    from ostrich_spark.dedup import minhash_signatures, simhash
    from ostrich_spark.textops import fingerprint

    df = spark.createDataFrame(
        [(i, f"alpha beta gamma doc{i} text body") for i in range(50)],
        ["doc_id", "text"],
    )
    for op in (minhash_signatures, simhash, fingerprint):
        plan = op(df)._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan, f"{op.__name__} plan regressed to a window"
        assert "SinglePartition" not in plan, f"{op.__name__} has a serial exchange"
        # one hash-partitioned exchange on doc_id, nothing else wide
        n_exchanges = plan.count("Exchange hashpartitioning")
        assert n_exchanges == 1, f"{op.__name__}: {n_exchanges} wide exchanges"
        assert "hashpartitioning(doc_id" in plan


def test_cli_stats(small_index):
    """`stats` prints manifest summary + per-segment lineage; clean error
    (exit 2, no traceback) on a missing index."""
    out = subprocess.run(
        [sys.executable, "-m", "ostrich_spark", "stats", "-p", small_index],
        capture_output=True, text=True, timeout=120, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "opstamp" in out.stdout and "segments" in out.stdout
    assert "partition" in out.stdout or "merged from" in out.stdout

    bad = subprocess.run(
        [sys.executable, "-m", "ostrich_spark", "stats", "-p", "/nonexistent"],
        capture_output=True, text=True, timeout=120, cwd="/root/repo",
    )
    assert bad.returncode == 2
    assert "no index at" in bad.stderr and "Traceback" not in bad.stderr


def test_cli_msearch_batched(small_index):
    """msearch runs the whole set as one job and prints per-query hits."""
    out = subprocess.run(
        [sys.executable, "-m", "ostrich_spark", "msearch", "-p", small_index,
         "-q", "a=content:merge_policy", "-q", "b=content:search OR content:index",
         "-l", "3", "--scorer", "tfidf"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.strip()]
    hit_lines = [l for l in lines if "/" in l and not l.startswith("elapsed")]
    qids = {l.split()[0] for l in hit_lines}
    assert qids == {"a", "b"}
    for l in hit_lines:
        qid, addr, score = l.split()
        seg, doc = addr.split("/")
        int(seg), int(doc), float(score)
    assert any("2 queries in one job" in l for l in lines)


@pytest.fixture(scope="module")
def num_index(spark, tmp_path_factory):
    """Index with a numeric doc-value field for sort/agg CLI surfaces."""
    from pyspark.sql import functions as F

    tmp = tmp_path_factory.mktemp("cli_num")
    idx = str(tmp / "idx")
    pdf = make_corpus(120, seed=3)
    schema = Schema()
    schema.add_text_field("content", "default")
    schema.add_numeric_field("size_bytes")
    df = spark.createDataFrame(pdf).withColumn("size_bytes", F.length("content"))
    build_index(
        spark, df, schema, idx,
        num_partitions=3, order_col="path", id_cols=["path"], build_id="cli",
    )
    return idx


def test_cli_search_sort_by(num_index):
    """--sort-by orders hits by the doc-value field, not score."""
    out = subprocess.run(
        [sys.executable, "-m", "ostrich_spark", "search", "content:merge_policy",
         "-p", num_index, "-l", "5", "--sort-by", "size_bytes"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines()
             if l.strip() and not l.startswith("elapsed")]
    vals = [float(l.split()[1]) for l in lines]
    assert vals and vals == sorted(vals, reverse=True)  # default descending

    asc = subprocess.run(
        [sys.executable, "-m", "ostrich_spark", "search", "content:merge_policy",
         "-p", num_index, "-l", "5", "--sort-by", "size_bytes", "--asc"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert asc.returncode == 0, asc.stderr[-2000:]
    avals = [float(l.split()[1]) for l in asc.stdout.splitlines()
             if l.strip() and not l.startswith("elapsed")]
    assert avals == sorted(avals)


def test_cli_agg_stats_and_hist(num_index):
    """agg --stats prints one summary line; --hist prints bucket counts
    summing to n; exactly-one-mode is enforced."""
    st = subprocess.run(
        [sys.executable, "-m", "ostrich_spark", "agg", "content:merge_policy",
         "-p", num_index, "--stats", "size_bytes"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert st.returncode == 0, st.stderr[-2000:]
    line = next(l for l in st.stdout.splitlines() if l.startswith("n "))
    parts = line.split()
    n = int(parts[1])
    assert n > 0 and float(parts[3]) <= float(parts[5])  # min <= max

    hi = subprocess.run(
        [sys.executable, "-m", "ostrich_spark", "agg", "content:merge_policy",
         "-p", num_index, "--hist", "size_bytes", "--bin", "100"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert hi.returncode == 0, hi.stderr[-2000:]
    rows = [l.split() for l in hi.stdout.splitlines()
            if l.strip() and not l.startswith("elapsed")]
    assert sum(int(c) for _, c in rows) == n
    buckets = [float(b) for b, _ in rows]
    assert buckets == sorted(buckets)

    bad = subprocess.run(
        [sys.executable, "-m", "ostrich_spark", "agg", "content:merge_policy",
         "-p", num_index],
        capture_output=True, text=True, timeout=120, cwd="/root/repo",
    )
    assert bad.returncode == 2 and "exactly one of" in bad.stderr


def test_cli_mlt(small_index):
    """mlt prints docAddress score lines; source text pulled from the
    corpus should surface similar docs."""
    out = subprocess.run(
        [sys.executable, "-m", "ostrich_spark", "mlt",
         "merge policy considers segments", "-p", small_index,
         "--field", "content", "-l", "5", "--scorer", "tfidf"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    hit_lines = [l for l in out.stdout.splitlines()
                 if "/" in l and not l.startswith("elapsed")]
    assert hit_lines
    for l in hit_lines:
        addr, score = l.split()
        seg, doc = addr.split("/")
        int(seg), int(doc), float(score)

    bad = subprocess.run(
        [sys.executable, "-m", "ostrich_spark", "mlt", "-p", small_index,
         "--field", "content"],
        capture_output=True, text=True, timeout=120, cwd="/root/repo",
    )
    assert bad.returncode == 2 and "need exactly one of TEXT" in bad.stderr


def test_cli_search_after_cursor(small_index):
    """--after pages: page 2 via cursor equals rows 4-6 of one big search."""
    base = [sys.executable, "-m", "ostrich_spark", "search", "content:merge_policy OR content:segment",
            "-p", small_index, "--scorer", "tfidf"]
    kw = dict(capture_output=True, text=True, timeout=300, cwd="/root/repo")

    def hits(out):
        return [l.split() for l in out.stdout.splitlines()
                if "/" in l and not l.startswith(("count", "elapsed"))]

    full = subprocess.run(base + ["-l", "6"], **kw)
    assert full.returncode == 0, full.stderr[-2000:]
    all_hits = hits(full)
    assert len(all_hits) == 6
    page1 = subprocess.run(base + ["-l", "3"], **kw)
    addr, score = hits(page1)[-1]
    seg, doc = addr.split("/")
    page2 = subprocess.run(base + ["-l", "3", "--after", f"{score},{seg},{doc}"], **kw)
    assert page2.returncode == 0, page2.stderr[-2000:]
    assert hits(page2) == all_hits[3:]


def test_cli_sigterms(small_index):
    out = subprocess.run(
        [sys.executable, "-m", "ostrich_spark", "sigterms", "content:merge_policy",
         "-p", small_index, "--field", "content", "--top", "5"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.strip() and not l.startswith("elapsed")]
    assert 1 <= len(lines) <= 5
    for l in lines:
        term, n, df = l.split()
        assert int(n) <= int(df)
    # the queried term's analyzed constituents ('_' separates) are
    # most-frequent foreground terms
    assert {"merge", "policy"} & {l.split()[0] for l in lines}


def test_cli_suggest(small_index):
    out = subprocess.run(
        [sys.executable, "-m", "ostrich_spark", "suggest", "merge_polcy",
         "-p", small_index, "--field", "content", "--top", "3"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.strip() and not l.startswith("elapsed")]
    assert lines, out.stdout
    # analyzer splits merge_polcy -> merge (in dictionary, distance 0 first)
    term, df, dist = lines[0].split()
    assert term == "merge" and dist == "0"


def test_cli_suggest_transpositions(small_index):
    """--transpositions: 'mrege' reaches 'merge' at ONE Damerau edit
    (adjacent swap); plain Levenshtein at max-dist 1 cannot."""
    base = [sys.executable, "-m", "ostrich_spark", "suggest", "mrege",
            "-p", small_index, "--field", "content", "--max-dist", "1"]
    with_t = subprocess.run(
        base + ["--transpositions"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert with_t.returncode == 0, with_t.stderr[-2000:]
    lines = [l.split() for l in with_t.stdout.splitlines()
             if l.strip() and not l.startswith("elapsed")]
    assert any(t == "merge" and d == "1" for t, _, d in lines), with_t.stdout
    plain = subprocess.run(
        base, capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert plain.returncode == 0, plain.stderr[-2000:]
    assert not any(
        l.split()[0] == "merge"
        for l in plain.stdout.splitlines()
        if l.strip() and not l.startswith("elapsed")
    ), plain.stdout


def test_cli_analyze(small_index):
    """ES _analyze analog: named analyzer, index-field analyzer, and the
    doc-value rejection — all driver-side (no Spark session)."""
    out = subprocess.run(
        [sys.executable, "-m", "ostrich_spark", "analyze",
         "Having Confidence in serious_viruses", "--analyzer", "en_stem"],
        capture_output=True, text=True, timeout=120, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    toks = [l.split("\t")[1] for l in out.stdout.splitlines() if "\t" in l]
    assert toks == ["confid", "seriou", "virus"]  # stem THEN stopword (A7)

    out = subprocess.run(
        [sys.executable, "-m", "ostrich_spark", "analyze", "Merge_Policy X",
         "-p", small_index, "--field", "content"],
        capture_output=True, text=True, timeout=120, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    toks = [l.split("\t")[1] for l in out.stdout.splitlines() if "\t" in l]
    assert toks == ["merge", "policy", "x"]

    out = subprocess.run(
        [sys.executable, "-m", "ostrich_spark", "analyze", "x",
         "-p", small_index, "--field", "nope"],
        capture_output=True, text=True, timeout=120, cwd="/root/repo",
    )
    assert out.returncode == 2 and "no field" in out.stderr


def test_cli_agg_range_and_fill(num_index):
    """agg --range prints declared buckets (empty ones included) in
    declaration order; --hist --fill zero-fills gaps; --ranges syntax
    errors exit 2."""
    rg = subprocess.run(
        [sys.executable, "-m", "ostrich_spark", "agg", "content:merge_policy",
         "-p", num_index, "--range", "size_bytes",
         "--ranges", "small::300,large:300:,never:900000:999999"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert rg.returncode == 0, rg.stderr[-2000:]
    rows = [l.split() for l in rg.stdout.splitlines()
            if l.strip() and not l.startswith("elapsed")]
    assert [r[0] for r in rows] == ["small", "large", "never"]
    assert int(rows[2][-1]) == 0  # declared-but-empty bucket present
    assert int(rows[0][-1]) + int(rows[1][-1]) > 0

    filled = subprocess.run(
        [sys.executable, "-m", "ostrich_spark", "agg", "content:merge_policy",
         "-p", num_index, "--hist", "size_bytes", "--bin", "50", "--fill"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert filled.returncode == 0, filled.stderr[-2000:]
    frows = [l.split() for l in filled.stdout.splitlines()
             if l.strip() and not l.startswith("elapsed")]
    buckets = [float(b) for b, _ in frows]
    # contiguous spine: every 50-wide step present between min and max
    assert len(buckets) == int(round((max(buckets) - min(buckets)) / 50)) + 1

    bad = subprocess.run(
        [sys.executable, "-m", "ostrich_spark", "agg", "content:merge_policy",
         "-p", num_index, "--range", "size_bytes", "--ranges", "oops"],
        capture_output=True, text=True, timeout=120, cwd="/root/repo",
    )
    assert bad.returncode == 2 and "KEY:LO:HI" in bad.stderr
