"""Pairwise precision/recall evaluation (SURVEY §2.3 J7, §2.4 A5).

Reference: ``evaluator.py:33-63`` — predicted pairs are all intra-cluster
pairs, compared as Python sets against ground-truth pairs.  Distributed
shape: canonicalized pair frames compared with semi/anti joins; predicted
pairs are generated per-cluster WITHOUT the O(m^2) clique explosion for
giant clusters unless needed — for evaluation we must materialize true
pairs, so clusters above ``max_cluster`` are counted analytically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def canonical_pairs(df: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    return df.select(
        F.least(F.col(a), F.col(b)).alias("a"),
        F.greatest(F.col(a), F.col(b)).alias("b"),
    ).filter(F.col("a") != F.col("b")).distinct()


def cluster_pairs(assignments: DataFrame) -> DataFrame:
    """All intra-cluster pairs (a < b) — the reference's predicted-pair set
    (``evaluator.py:38-44``).  Self-join on cluster_id; fine at evaluation
    scale, guarded by callers at web scale."""
    l = assignments.select(F.col("cluster_id"), F.col("id").alias("a"))
    r = assignments.select(F.col("cluster_id"), F.col("id").alias("b"))
    return (
        l.join(r, "cluster_id")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
    )


def metrics_frame(predicted: DataFrame, truth: DataFrame,
                  assume_canonical: bool = False) -> DataFrame:
    """One-row (tp, fp, fn, precision, recall, f1) — the reference's
    evaluation report (``evaluator.py:58-63``) as a DataFrame.

    Computed in ONE action over a single full-outer join of the two
    canonical pair sets.  (The first cut ran three separate semi/anti-join
    count() actions, each re-deriving both canonicalized inputs — 3x the
    join work for one report row.)  Ratios are float64 from exact counts,
    rounded to 6 decimals only at the output edge; f1 is derived from the
    UNROUNDED precision/recall so both engines agree bit-for-bit.

    ``assume_canonical=True`` (r7): skip the least/greatest + distinct
    normalization — one exchange per input — when the CALLER guarantees
    both frames are already canonical pair sets (a < b, no duplicates),
    e.g. matcher edge frames and ``cluster_pairs`` output.  Results are
    identical for such inputs; leave False for arbitrary frames."""
    if assume_canonical:
        p = predicted.select("a", "b").withColumn("_p", F.lit(1))
        t = truth.select("a", "b").withColumn("_t", F.lit(1))
    else:
        p = canonical_pairs(predicted).withColumn("_p", F.lit(1))
        t = canonical_pairs(truth).withColumn("_t", F.lit(1))
    j = p.join(t, ["a", "b"], "full_outer")
    counts = j.agg(
        F.coalesce(F.sum(F.when(
            F.col("_p").isNotNull() & F.col("_t").isNotNull(), 1)),
            F.lit(0)).cast("long").alias("tp"),
        F.coalesce(F.sum(F.when(
            F.col("_p").isNotNull() & F.col("_t").isNull(), 1)),
            F.lit(0)).cast("long").alias("fp"),
        F.coalesce(F.sum(F.when(
            F.col("_p").isNull() & F.col("_t").isNotNull(), 1)),
            F.lit(0)).cast("long").alias("fn"),
    )
    prec = F.when(F.col("tp") + F.col("fp") > 0,
                  F.col("tp") / (F.col("tp") + F.col("fp"))).otherwise(F.lit(0.0))
    rec = F.when(F.col("tp") + F.col("fn") > 0,
                 F.col("tp") / (F.col("tp") + F.col("fn"))).otherwise(F.lit(0.0))
    f1 = F.when(F.col("_prec") + F.col("_rec") > 0,
                2.0 * F.col("_prec") * F.col("_rec")
                / (F.col("_prec") + F.col("_rec"))).otherwise(F.lit(0.0))
    return (
        counts.withColumn("_prec", prec).withColumn("_rec", rec)
        .select("tp", "fp", "fn",
                F.round("_prec", 6).alias("precision"),
                F.round("_rec", 6).alias("recall"),
                F.round(f1, 6).alias("f1"))
    )


def pairwise_metrics(predicted: DataFrame, truth: DataFrame) -> dict:
    """tp/fp/fn + precision/recall/f1, exactly as ``evaluator.py:58-63``.
    Ratios here are UNROUNDED (recomputed from the exact counts)."""
    r = metrics_frame(predicted, truth).first()
    tp, fp, fn = int(r["tp"]), int(r["fp"]), int(r["fn"])
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = (2 * precision * recall / (precision + recall)
          if precision + recall else 0.0)
    return {"tp": tp, "fp": fp, "fn": fn,
            "precision": precision, "recall": recall, "f1": f1}
