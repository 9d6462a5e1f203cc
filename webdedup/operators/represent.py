"""Representative selection + cluster collection (SURVEY §2.5 W1, §2.4 A4).

Reference: ``choose_representatives`` picks the best image per cluster by
``0.7*(w*h) + 1.0*sharpness`` (``image_utils.py:22-40``).  The webtext analog
uses a deterministic quality score (default: ``n_chars``, the fixture's
stand-in for resolution) with id as tie-break, as a ranking window — one
shuffle on cluster_id, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def representatives(assignments: DataFrame, docs: DataFrame,
                    id_col: str = "doc_id", score_col: str = "n_chars") -> DataFrame:
    """(cluster_id, representative_id, score) — argmax score per cluster,
    ties broken by min id (fully deterministic)."""
    joined = assignments.join(
        docs.select(F.col(id_col).alias("id"), F.col(score_col).alias("score")),
        "id",
    )
    w = Window.partitionBy("cluster_id").orderBy(F.desc("score"), F.asc("id"))
    return (
        joined.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("cluster_id", F.col("id").alias("representative_id"), "score")
    )


def cluster_sizes(assignments: DataFrame) -> DataFrame:
    """(cluster_id, n_members) — the scalable substitute for the reference's
    list-of-lists cluster JSON (``run_pipeline.py:213-217``); member lists
    are only collected for small clusters on demand."""
    return assignments.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members")
    )


def duplicate_sets(assignments: DataFrame, max_members: int = 1000) -> DataFrame:
    """(cluster_id, n_members, member_ids) for clusters with >1 member;
    member list capped at ``max_members`` (sorted, so deterministic)."""
    return (
        assignments.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.slice(F.array_sort(F.collect_list("id")), 1, max_members)
            .alias("member_ids"),
        )
        .filter(F.col("n_members") > 1)
    )
