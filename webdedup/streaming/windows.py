"""Watermarked event-time windowed crawl-quality metrics.

The batch side's index-stats aggregation (A6, reference
``run_pipeline.py:443-459`` report counters) re-expressed for a live crawl
feed: per event-time window, how many pages arrived and what fraction were
exact duplicates — the monitoring signal that tells an operator the crawler
is re-fetching (dup-rate spike) or the frontier collapsed (volume drop).

Streaming disallows ``countDistinct``, so distinct-content counts use the
chained time-window aggregation pattern (Spark >= 3.4):

1. aggregate to (window, content_sha) with a copy count — stateful, keyed
   by the window + hash, state evicted when the watermark passes the
   window end;
2. re-window with ``window_time`` and aggregate per window: rows at this
   level ARE the distinct hashes, so ``count(*)`` = distinct contents and
   ``sum(n_copies)`` = total pages.

Both levels share one watermark; windows finalize and emit exactly once in
append mode (late rows beyond the watermark are dropped, the documented
lateness contract).  At web scale each level is an ordinary hash
aggregation partitioned by (window, hash) / (window) — no per-key driver
state, no unbounded growth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def window_dup_stats(enriched: DataFrame, window: str = "1 hour",
                     watermark: str = "2 hours") -> DataFrame:
    """(window_start, window_end, n_pages, n_distinct, n_exact_dups,
    dup_rate) per event-time tumbling window.

    ``enriched``: a frame with ``warc_ts`` (event time) and ``content_sha``
    (from ``ingest.enrich_stream``).  Works identically on a batch frame —
    the batch/stream parity test relies on that.
    """
    per_hash = (
        enriched.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "content_sha")
        .agg(F.count(F.lit(1)).alias("n_copies"))
    )
    return (
        per_hash
        .groupBy(F.window(F.window_time("w"), window).alias("w"))
        .agg(
            F.sum("n_copies").alias("n_pages"),
            F.count(F.lit(1)).alias("n_distinct"),
            (F.sum("n_copies") - F.count(F.lit(1))).alias("n_exact_dups"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_pages", "n_distinct", "n_exact_dups",
            F.round(
                (F.col("n_pages") - F.col("n_distinct"))
                / F.col("n_pages"), 6).alias("dup_rate"),
        )
    )


def write_window_stats_stream(stats: DataFrame, out_dir: str,
                              checkpoint_dir: str, once: bool = True):
    """Append sink: each window row is emitted once, when the watermark
    closes the window."""
    writer = (
        stats.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
