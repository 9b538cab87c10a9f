"""Deployment contract: the engine must run via `spark-submit --py-files
ostrich_spark.zip` (north rule) — the whole package imported from the
shipped zip inside a standalone Spark distribution, not from the repo
checkout. Skipped when no spark-submit binary is on the box.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"

JOB = """
import sys, shutil
from pyspark.sql import SparkSession
spark = SparkSession.builder.appName("ostrich-submit-test").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
from ostrich_spark.build import build_index
from ostrich_spark.schema import Schema
from ostrich_spark.query.exec import search
corpus = spark.read.parquet(sys.argv[1]).withColumnRenamed("text", "content")
schema = Schema(); schema.add_text_field("content", "default")
shutil.rmtree(sys.argv[2], ignore_errors=True)
m = build_index(spark, corpus, schema, sys.argv[2], num_partitions=2,
                order_col="doc_id", id_cols=["doc_id"])
res, cnt = search(spark, sys.argv[2], "content:the", limit=3, scorer="bm25",
                  with_count=True)
n = len(res.collect())
print(f"SUBMIT_OK docs={m.total_docs} hits={cnt} rows={n}")
spark.stop()
"""


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="no spark-submit")
def test_py_files_deployment(tmp_path):
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "package.py")],
        check=True, capture_output=True, timeout=120,
    )
    job = tmp_path / "job.py"
    job.write_text(JOB)
    out = subprocess.run(
        [
            SPARK_SUBMIT, "--master", "local[4]",
            "--py-files", os.path.join(REPO, "dist", "ostrich_spark.zip"),
            str(job), "/root/testdata/sf0.001/documents.parquet",
            str(tmp_path / "idx"),
        ],
        capture_output=True, text=True, timeout=420,
        # run from a neutral cwd so imports MUST come from the zip
        cwd=str(tmp_path),
    )
    assert out.returncode == 0, out.stderr[-3000:]
    ok = [l for l in out.stdout.splitlines() if l.startswith("SUBMIT_OK")]
    assert ok, out.stdout[-2000:]
    assert "docs=500" in ok[0] and "rows=3" in ok[0]
