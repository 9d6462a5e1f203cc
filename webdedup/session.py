"""SparkSession factory tuned for the dedup workload.

Local-mode settings approximate the cluster posture described in
BASELINE.json's north_rule: AQE on (skew-join splitting for hot LSH bands),
Arrow on (every signature UDF is Arrow-batched), shuffle partitions sized to
cores.  On a real cluster the same builder is driven by spark-submit conf.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "webdedup",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)
    b = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # 8 MB (not the 64 MB default): LSH candidate/verify shuffles carry
        # few bytes per unit of join/sort CPU, so 64 MB reducers leave most
        # cores idle; 8 MB keeps reducer counts near the core count
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("WEBDEDUP_DRIVER_MEM", "32g"))
        .config("spark.ui.enabled", "false")
        # 16 MB: big enough for id-lists/dims, small enough that wide-array
        # tables (shingle sets ~45 MB at 18k docs) never broadcast — per-task
        # broadcast deserialization of array columns is a GC storm
        .config("spark.sql.autoBroadcastJoinThreshold", str(16 * 1024 * 1024))
        # tmpfs shuffle dir: the sandbox's virtual disk has high syscall
        # overhead; shuffle volumes here are far below RAM capacity
        .config("spark.local.dir",
                os.environ.get("WEBDEDUP_LOCAL_DIR", "/dev/shm/spark-local"))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
