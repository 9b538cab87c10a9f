import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("ostrich-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield spark
    spark.stop()


EXAMPLE_DOCS = [
    # /root/reference/example/main.go:33-64
    {
        "phrase": "Down To The Wire",
        "description": "A tense situation where the outcome is decided only in the last few seconds.",
    },
    {
        "phrase": "Eat My Hat",
        "description": "Having confidence in a specific outcome; being almost sure about something",
    },
    {
        "phrase": "When the Rubber Hits the Road",
        "description": "When something is about to begin, get serious, or put to the test.",
    },
]


@pytest.fixture(scope="session")
def example_schema():
    from ostrich_spark.schema import Schema

    s = Schema()
    s.add_text_field("phrase", "en_stem")
    s.add_text_field("description", "en_stem")
    return s


@pytest.fixture(scope="session")
def example_docs():
    return EXAMPLE_DOCS
