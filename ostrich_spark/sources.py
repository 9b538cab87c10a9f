"""Corpus sources — load the Iceberg-shaped input table
(repo, path, commit, lang, content) from the formats a 10^12-file crawl
actually lands in.

The north-rule input is an Iceberg table; this sandbox ships no Iceberg
runtime jar, so that path is GATED behind a clear error naming the
public artifact to add (`--packages org.apache.iceberg:...`) while the
Spark-side call (`spark.table`) is the real one — on a cluster with the
catalog configured it works unchanged. Parquet / JSON / CSV / raw
source-tree ingestion run here and are tested.

URI forms accepted by ``load_corpus``:
- ``/path/to/file_or_dir.parquet`` (or ``parquet:...``) — parquet scan
- ``json:/path`` / ``csv:/path`` — with the corpus schema enforced
- ``files:/path/to/source/tree`` — binaryFile scan of a code tree:
  path relativized, lang inferred from extension, content UTF-8
  decoded; repo defaults to the root dir name, commit to "" (no VCS
  introspection — the crawler owns that at scale)
- ``iceberg:catalog.db.table`` — spark.table() through a configured
  Iceberg catalog
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

CORPUS_COLUMNS = ["repo", "path", "commit", "lang", "content"]

_EXT_LANG = {
    "py": "python", "go": "go", "rs": "rust", "java": "java", "c": "c",
    "h": "c", "cc": "cpp", "cpp": "cpp", "hpp": "cpp", "js": "javascript",
    "ts": "typescript", "rb": "ruby", "scala": "scala", "kt": "kotlin",
    "sh": "shell", "sql": "sql", "md": "markdown", "txt": "text",
    "json": "json", "yaml": "yaml", "yml": "yaml", "toml": "toml",
    "xml": "xml", "html": "html", "css": "css",
}

ICEBERG_HELP = (
    "Iceberg runtime not available in this Spark distribution. On a real "
    "cluster add the public artifact, e.g. spark-submit --packages "
    "org.apache.iceberg:iceberg-spark-runtime-3.5_2.13:<version> and "
    "configure spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog."
)


def validate_corpus(df, require_all: bool = False):
    """Check the Iceberg-shaped contract: `content` is mandatory; the
    identity columns are filled with typed defaults when absent (a crawl
    shard may carry only path+content)."""
    cols = set(df.columns)
    if "content" not in cols:
        raise ValueError(f"corpus must have a 'content' column, got {sorted(cols)}")
    if require_all:
        missing = [c for c in CORPUS_COLUMNS if c not in cols]
        if missing:
            raise ValueError(f"corpus missing columns {missing}")
    for c in CORPUS_COLUMNS:
        if c not in cols:
            df = df.withColumn(c, F.lit(""))
    return df.select(*CORPUS_COLUMNS, *[c for c in df.columns if c not in CORPUS_COLUMNS])


def _lang_from_path(col):
    ext = F.lower(F.element_at(F.split(col, r"\."), -1))
    mapping = F.create_map(*[F.lit(x) for kv in _EXT_LANG.items() for x in kv])
    return F.coalesce(mapping[ext], F.lit("unknown"))


def load_source_tree(spark, root: str, repo: str | None = None):
    """Ingest a raw source-code tree as a corpus: one row per file.

    binaryFile is a built-in Spark format (recursive, partitioned scan —
    the same path works on s3a:// at crawl scale); content is UTF-8
    decoded JVM-side. Binary/undecodable files keep a best-effort lossy
    decode (Spark's binary->string cast replaces invalid sequences).
    """
    root = root.rstrip("/")
    repo = repo or os.path.basename(root)
    df = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(root)
    )
    # Relativize by stripping the literal root prefix, not a regex on the
    # basename: a root like 'c++' or 'my.repo' would malform/greedy-match
    # a regex, and a nested dir that happens to share the basename would
    # collide distinct files onto one relative path. binaryFile paths are
    # URIs (file:/..., s3a://...); normalize the scheme to an absolute
    # path, then substring past the root (position is 1-based).
    import re as _re

    _SCHEME = r"^[A-Za-z][A-Za-z0-9+.-]*:/+"
    root_norm = _re.sub(_SCHEME, "/", root)
    normalized = F.regexp_replace(F.col("path"), _SCHEME, "/")
    rel = F.when(
        F.substring(normalized, 1, len(root_norm) + 1) == F.lit(root_norm + "/"),
        F.substring(normalized, len(root_norm) + 2, 2_000_000_000),
    ).otherwise(normalized)
    return (
        df.select(
            F.lit(repo).alias("repo"),
            rel.alias("path"),
            F.lit("").alias("commit"),
            _lang_from_path(rel).alias("lang"),
            F.col("content").cast("string").alias("content"),
        )
    )


def load_corpus(spark, uri: str, shape: bool = True, **kwargs):
    """Dispatch on the URI prefix; returns a corpus DataFrame. With
    ``shape=True`` (the pipeline default) the result is coerced to the
    (repo, path, commit, lang, content) contract; ``shape=False`` just
    dispatches the read (CLI builds over arbitrary field names)."""
    def _shape(df, require_all=False):
        return validate_corpus(df, require_all=require_all) if shape else df

    if uri.startswith("iceberg:"):
        table = uri[len("iceberg:"):]
        try:
            return _shape(spark.table(table), require_all=True)
        except Exception as e:  # catalog/jar absent → actionable message
            raise RuntimeError(f"cannot read iceberg table {table!r}: {e}\n{ICEBERG_HELP}") from e
    if uri.startswith("files:"):
        return load_source_tree(spark, uri[len("files:"):], repo=kwargs.get("repo"))
    if uri.startswith("json:"):
        return _shape(spark.read.json(uri[len("json:"):]))
    if uri.startswith("csv:"):
        return _shape(
            spark.read.option("header", "true").option("multiLine", "true").csv(uri[len("csv:"):])
        )
    path = uri[len("parquet:"):] if uri.startswith("parquet:") else uri
    return _shape(spark.read.parquet(path))
