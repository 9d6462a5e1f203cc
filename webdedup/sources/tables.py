"""Loaders for the driver-generated testdata tables (TESTDATA.md)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id:bigint, text:string, lang:string, source:string, n_chars:bigint"""
    return load_table(spark, sf_dir, "documents")


def embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """vec_id:bigint, embedding:array<float>, label:int"""
    return load_table(spark, sf_dir, "embeddings")


def events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """event_id:bigint, ts:timestamp, user_id:bigint, event_type:string,
    value:double, props:string"""
    return load_table(spark, sf_dir, "events")
