"""Shared fixtures: one SparkSession for the whole run, small corpora."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from webdedup.config import DEFAULT as CFG  # noqa: E402
from webdedup.session import get_spark  # noqa: E402
from webdedup.sources import corpus  # noqa: E402

N_GROUPS = 40
SF0001 = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="webdedup-tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_rows():
    return corpus.corpus_rows(CFG.seed, N_GROUPS)


@pytest.fixture(scope="session")
def corpus_texts(corpus_rows):
    return {r["url"]: r["text"] for r in corpus_rows}


@pytest.fixture(scope="session")
def pages(spark, corpus_rows):
    df = spark.createDataFrame(corpus_rows, schema=corpus.PAGE_KIND_SCHEMA)
    df = df.cache()
    df.count()
    return df


@pytest.fixture(scope="session")
def docs(pages):
    from pyspark.sql import functions as F

    d = pages.select(F.col("url").alias("doc_id"), "text").cache()
    d.count()
    return d
