"""Exact (byte-level) dedup — the analog of the reference's ``--method exact``
branch: md5 file grouping at ``io_utils.py:16-30`` / ``run_pipeline.py:327-333``.

Spark-first shape (SURVEY §2.4 A1): a single hash aggregation.  Two outputs:

- ``exact_dup_groups`` — per-content-hash stats (no ``collect_list`` of
  members: a boilerplate hash can have millions of members at web scale, a
  collected list would OOM one reducer; min/max/count are enough and
  map-side-combinable).
- ``exact_dup_edges``  — *star* edges (group-min id -> member), linear in
  group size rather than the O(n^2) clique, and exactly what connected
  components needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_content_hash(df: DataFrame, text_col: str = "text",
                      out_col: str = "content_sha") -> DataFrame:
    return df.withColumn(out_col, F.sha2(F.col(text_col), 256))


def exact_dup_groups(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(content_sha, n_members, min_id, max_id) for groups with >1 member."""
    return (
        with_content_hash(df, text_col)
        .groupBy("content_sha")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.min(id_col).alias("min_id"),
            F.max(id_col).alias("max_id"),
        )
        .filter(F.col("n_members") > 1)
    )


def exact_dup_edges(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Star edges (src=min id of the hash group, dst=other members).

    One shuffle on the content hash; the window min is computed without a
    second shuffle because the window partitions by the same key.
    """
    hashed = with_content_hash(df, text_col).select(id_col, "content_sha")
    w = Window.partitionBy("content_sha")
    return (
        hashed.withColumn("src", F.min(id_col).over(w))
        .filter(F.col(id_col) != F.col("src"))
        .select("src", F.col(id_col).alias("dst"))
    )
