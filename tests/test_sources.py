"""Corpus-source dispatch: parquet / json / csv / raw source tree load
into the (repo, path, commit, lang, content) contract; the Iceberg path
is gated behind an actionable error in jar-less environments."""

from __future__ import annotations

import os

import pytest

from ostrich_spark.sources import CORPUS_COLUMNS, load_corpus, load_source_tree

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def shaped_pdf():
    import pandas as pd

    return pd.DataFrame(
        {
            "repo": ["org/r1", "org/r1", "org/r2"],
            "path": ["a/main.py", "b/util.go", "c/lib.rs"],
            "commit": ["c1", "c1", "c2"],
            "lang": ["python", "go", "rust"],
            "content": ["def main(): pass", "func Util() {}", "fn lib() {}"],
        }
    )


def test_parquet_roundtrip(spark, shaped_pdf, tmp_path):
    p = str(tmp_path / "c.parquet")
    spark.createDataFrame(shaped_pdf).write.parquet(p)
    df = load_corpus(spark, p)
    assert df.columns[:5] == CORPUS_COLUMNS
    assert df.count() == 3


def test_json_and_csv_default_missing_identity(spark, shaped_pdf, tmp_path):
    j = str(tmp_path / "c.json")
    spark.createDataFrame(shaped_pdf[["path", "content"]]).write.json(j)
    df = load_corpus(spark, f"json:{j}")
    assert df.columns[:5] == CORPUS_COLUMNS
    row = df.filter(df.path == "a/main.py").collect()[0]
    assert row["repo"] == "" and row["content"] == "def main(): pass"

    c = str(tmp_path / "c.csv")
    spark.createDataFrame(shaped_pdf[["path", "content"]]).write.option("header", "true").csv(c)
    assert load_corpus(spark, f"csv:{c}").count() == 3


def test_content_column_mandatory(spark, shaped_pdf, tmp_path):
    p = str(tmp_path / "bad.parquet")
    spark.createDataFrame(shaped_pdf[["path", "lang"]]).write.parquet(p)
    with pytest.raises(ValueError, match="content"):
        load_corpus(spark, p)


def test_source_tree_ingestion(spark, tmp_path):
    root = tmp_path / "myrepo"
    (root / "src").mkdir(parents=True)
    (root / "src" / "main.py").write_text("import os\ndef run(): return 1\n")
    (root / "src" / "lib.go").write_text("package lib\nfunc Add() {}\n")
    (root / "README.md").write_text("# myrepo\nhello world\n")
    df = load_source_tree(spark, str(root))
    rows = {r["path"]: r for r in df.collect()}
    assert set(rows) == {"src/main.py", "src/lib.go", "README.md"}
    assert rows["src/main.py"]["lang"] == "python"
    assert rows["src/lib.go"]["lang"] == "go"
    assert rows["README.md"]["lang"] == "markdown"
    assert rows["src/main.py"]["repo"] == "myrepo"
    assert "def run()" in rows["src/main.py"]["content"]
    # end-to-end: the ingested tree is indexable and searchable
    from ostrich_spark.build import build_index
    from ostrich_spark.query.exec import search
    from ostrich_spark.schema import Schema

    sch = Schema()
    sch.add_text_field("content", "default")
    idx = str(tmp_path / "idx")
    build_index(spark, df, sch, idx, num_partitions=2, order_col="path", id_cols=["path"])
    res, _ = search(spark, idx, "content:def AND content:run", limit=5)
    assert len(res.collect()) == 1


def test_iceberg_gated_error(spark):
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        load_corpus(spark, "iceberg:demo.db.repos")


def test_cli_build_accepts_files_uri(tmp_path):
    import subprocess
    import sys

    root = tmp_path / "repo2"
    root.mkdir()
    (root / "x.py").write_text("alpha beta gamma\n")
    out = subprocess.run(
        [sys.executable, "-m", "ostrich_spark", "build", f"files:{root}",
         "-p", str(tmp_path / "idx2"), "--field", "content", "--partitions", "1",
         "--order-col", "path", "--id-col", "path"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "built 1 segments, 1 docs" in out.stdout


def test_pipeline_example_end_to_end(tmp_path):
    """examples/pipeline.py chains ingest -> quality -> scrub -> dedup ->
    sample -> chunk -> index -> search on a demo tree with a known spam
    file, a near-dup pair, and one email."""
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "pipeline.py"),],
        capture_output=True, text=True, timeout=420, cwd=str(tmp_path),
    )
    assert out.returncode == 0, out.stderr[-3000:]
    got = dict(
        l.split(": ", 1) for l in out.stdout.splitlines() if ": " in l
    )
    assert got["ingested"] == "5"
    assert got["after_quality"] == "4"      # spam.txt dropped (rep_ratio 1.0)
    assert got["pii_redactions"] == "1"     # the email in notes.md
    # the build-bot footer lives in 3 files -> line df 3 > max_line_df 2,
    # dropped from every doc; the engine pair's content lines (df 2) stay
    assert got["boilerplate_lines_dropped"] == "3"
    assert got["ppl_band"].startswith("(")  # perplexity band recorded
    assert got["after_dedup"] == "3"        # engine.py/engine_copy.py collapsed
    assert got["chunks"] == "3"
    assert "engine" in got["top_hits"] and "notes.md" in got["top_hits"]
    assert got["wildcard_hits"] == "1"      # m?rge matches 'merge'
    assert got["sloppy_hits"] == "1"        # "delta packed"~2 in notes.md
    assert "engine" in got["mlt_hits"]      # self-similarity top hit
    assert got["match_size_stats"].startswith("(1,")
    assert got["did_you_mean"].startswith("['postings'")  # postngs -> postings
    assert got["explained_score_matches"] == "True"
    assert got["upserted"] == "1"
    assert got["fsck_findings"] == "[]"     # incl. empty-purge-drop invariant
    # significant_text over the text:merge sample: every engine.py-only
    # term ties on jlh (df=1 of 3), term-asc tie-break pins the cut
    assert got["sig_text_top"] == "['def', 'merge', 'policy']"
    assert got["stream_hits"] == "(1, 1)"   # 2-generation stream, one alias
    assert got["ann_quantized_top"] == "0"  # int8+rescore: self-sim wins
