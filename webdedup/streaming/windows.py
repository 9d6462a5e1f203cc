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

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_UNIT_SECONDS = {
    "week": 604800, "day": 86400, "hour": 3600, "minute": 60,
    "second": 1, "millisecond": 1e-3, "microsecond": 1e-6,
}


def _interval_seconds(spec: str) -> float:
    """Seconds in a Spark interval string like ``'1 hour'`` or
    ``'1 hour 30 minutes'`` — the subset Spark's window() accepts."""
    total, matched = 0.0, 0
    for num, unit in re.findall(
            r"(\d+(?:\.\d+)?)\s*([a-zA-Z]+)", spec):
        unit = unit.lower().rstrip("s")
        if unit not in _UNIT_SECONDS:
            raise ValueError(f"unknown interval unit {unit!r} in {spec!r}")
        total += float(num) * _UNIT_SECONDS[unit]
        matched += 1
    if matched == 0:
        raise ValueError(f"cannot parse interval {spec!r}")
    return total


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


def sliding_window_dup_stats(enriched: DataFrame, window: str = "1 hour",
                             slide: str = "15 minutes",
                             watermark: str = "2 hours") -> DataFrame:
    """Sliding-window variant of ``window_dup_stats``: (window_start,
    window_end, n_pages, n_distinct, n_exact_dups, dup_rate) per
    ``window``-long window advancing every ``slide`` — what a production
    freshness monitor actually runs (a 1 h dup-rate refreshed every 15 min,
    not once per hour).  ``slide`` must divide ``window``.

    Streaming distinct-per-sliding-window needs THREE chained time-window
    aggregations (each an ordinary hash agg, state evicted by the shared
    watermark):

    1. (tumbling ``slide`` bucket, content_sha) -> copy count: the dedup
       grain.  Tumbling-first keeps level-1 state at one row per distinct
       hash per slide, instead of ``window/slide`` copies of it;
    2. re-window ``window_time`` into the SLIDING spec, still keyed by
       content_sha: each (bucket, hash) row fans out to the
       ``window/slide`` containing windows, and the groupBy collapses a
       hash seen in several buckets of one window — rows here are
       (sliding window, distinct hash);
    3. a final per-window rollup.  A sliding ``window_time`` cannot be
       re-windowed (it would fan out again), but every sliding window's
       representative time (``end`` - 1µs) falls in its OWN last
       ``slide``-sized tumbling bucket, so grouping by that bucket plus
       the window struct is exact — one group per sliding window, with
       the event-time key streaming needs for eviction.

    Each page contributes to ``window/slide`` windows by design (that is
    what sliding means); dup_rate within a window counts every arrival.
    Works identically on a batch frame — the parity test pins it.

    Raises ``ValueError`` when ``slide`` does not divide ``window``: the
    level-2 re-window containment argument (a bucket's representative time
    being inside a sliding window implying the WHOLE bucket is) only holds
    for aligned buckets, and Spark would silently produce wrong per-window
    distinct counts rather than fail.  The DuckDB twin asserts the same
    (``oracle_sql.sliding_window_event_stats``).
    """
    win_s, slide_s = _interval_seconds(window), _interval_seconds(slide)
    n = round(win_s / slide_s) if slide_s > 0 else 0
    if slide_s <= 0 or abs(n * slide_s - win_s) > 1e-9 or n < 1:
        raise ValueError(
            f"slide ({slide!r} = {slide_s}s) must evenly divide window "
            f"({window!r} = {win_s}s)")
    per_hash = (
        enriched.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", slide).alias("w1"), "content_sha")
        .agg(F.count(F.lit(1)).alias("n_copies"))
    )
    per_window_hash = (
        per_hash
        .groupBy(F.window(F.window_time("w1"), window, slide).alias("w2"),
                 "content_sha")
        .agg(F.sum("n_copies").alias("n_copies"))
    )
    return (
        per_window_hash
        # w2's FIELDS as plain grouping keys: the tagged w2 struct itself
        # next to the new window would leave two event-time columns in one
        # stream ("More than one event time columns"); field extraction
        # strips the tag, and the w3 bucket<->w2 window 1:1 map keeps the
        # grouping exact
        .groupBy(F.window(F.window_time("w2"), slide).alias("w3"),
                 F.col("w2.start").alias("window_start"),
                 F.col("w2.end").alias("window_end"))
        .agg(
            F.sum("n_copies").alias("n_pages"),
            F.count(F.lit(1)).alias("n_distinct"),
            (F.sum("n_copies") - F.count(F.lit(1))).alias("n_exact_dups"),
        )
        .select(
            "window_start", "window_end",
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
