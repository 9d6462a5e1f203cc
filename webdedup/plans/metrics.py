"""Lineage + metrics rows (north_rule: per-partition lineage + metrics
enabling checkpoint-resumable restarts; reference analog is the RSS-sampling
timing harness ``run_pipeline.py:83-126`` and ``evaluator.py:68-83``).

Two granularities:

- stage metrics: one row per pipeline stage (rows, partitions, wall sec);
- partition lineage: one row per (stage, partition) with row counts, via a
  single ``groupBy(spark_partition_id())`` — cheap, no extra shuffle of the
  data itself, and enough to localize skew ("partition 17 has 40% of rows")
  and to audit resumed runs.
"""

from __future__ import annotations

import datetime as _dt
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STAGE_METRICS_TABLE = "metrics_stages"
PARTITION_LINEAGE_TABLE = "metrics_partitions"


def partition_lineage(df: DataFrame, stage: str) -> DataFrame:
    return (
        df.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn("stage", F.lit(stage))
        .select("stage", "partition_id", "n_rows")
    )


def peak_memory_mb(spark: SparkSession) -> tuple[float, float]:
    """(python_peak_rss_mb, jvm_heap_used_mb) — the A9 memory sample.

    The reference samples process RSS per stage (``run_pipeline.py:83-126``);
    the analog here is the driver Python's high-water RSS plus the live JVM
    heap (in ``local[*]`` the driver JVM *is* every executor, so this covers
    execution memory too).  On a real multi-executor cluster, extend with a
    SparkListener consuming ``executorMetricsUpdate.peakMemoryMetrics`` —
    same row schema, one row per executor."""
    import resource
    ru_kib = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss  # KiB (linux)
    rt = spark.sparkContext._jvm.java.lang.Runtime.getRuntime()
    jvm_mb = (rt.totalMemory() - rt.freeMemory()) / (1024.0 * 1024.0)
    return ru_kib / 1024.0, float(jvm_mb)


def append_stage_metrics(spark: SparkSession, work_dir: str, stage: str,
                         n_rows: int, wall_sec: float,
                         extra: dict | None = None) -> None:
    py_mb, jvm_mb = peak_memory_mb(spark)
    row = {
        "stage": stage,
        "n_rows": int(n_rows),
        "wall_sec": float(wall_sec),
        "peak_rss_mb": round(py_mb, 3),
        "jvm_heap_mb": round(jvm_mb, 3),
        "ts": _dt.datetime.now(_dt.timezone.utc).isoformat(),
        "extra": str(extra or {}),
    }
    df = spark.createDataFrame(
        [tuple(row.values())],
        schema="stage string, n_rows long, wall_sec double, "
               "peak_rss_mb double, jvm_heap_mb double, ts string, extra string"
    )
    df.coalesce(1).write.mode("append").parquet(
        os.path.join(work_dir, f"{STAGE_METRICS_TABLE}.parquet")
    )


def append_partition_lineage(df: DataFrame, work_dir: str, stage: str) -> None:
    partition_lineage(df, stage).coalesce(1).write.mode("append").parquet(
        os.path.join(work_dir, f"{PARTITION_LINEAGE_TABLE}.parquet")
    )


def read_stage_metrics(spark: SparkSession, work_dir: str) -> DataFrame:
    return spark.read.parquet(
        os.path.join(work_dir, f"{STAGE_METRICS_TABLE}.parquet")
    )
