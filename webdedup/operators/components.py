"""Iterative connected components: alternating large-star / small-star.

The reference resolves candidate pairs into single-link clusters with an
in-memory union-find (``run_pipeline.py:190-217``, path-halving).  That is
inherently sequential; the distributed equivalent (north_rule names it) is
the alternating algorithm of Kiveris et al., "Connected Components in
MapReduce and Beyond" (SoCC'14):

- large-star(u): connect every neighbor v > u to m = min(N(u) u {u})
- small-star(u): connect every neighbor v <= u (and u) to m = min of those

Each round is one shuffle (groupBy on the star center); the edge set
converges in O(log n) rounds to stars pointing at the component minimum —
robust to adversarial long chains, unlike plain min-label propagation whose
round count is the graph diameter.

Per-round ``localCheckpoint`` truncates the lineage (a fixpoint loop
otherwise accretes an unbounded plan — the Spark analog of the reference's
recursion depth).  On a cluster, set a durable checkpoint dir instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webdedup.config import DedupConfig, DEFAULT


def _canon(e: DataFrame, dedup: bool = True) -> DataFrame:
    """Canonical undirected edge set: (lo < hi), no self-loops; ``dedup``
    adds the distinct (one shuffle) — skipped between the two star passes
    where duplicates are harmless and the final distinct covers them."""
    out = (
        e.select(F.least("u", "v").alias("lo"), F.greatest("u", "v").alias("hi"))
        .filter(F.col("lo") != F.col("hi"))
    )
    if dedup:
        out = out.distinct()
    return out.select(F.col("lo").alias("u"), F.col("hi").alias("v"))


def _large_star(e: DataFrame) -> DataFrame:
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
    m = F.least(F.col("mn"), F.col("u"))
    out = (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), m.alias("v"))
    )
    return _canon(out, dedup=False)


def _small_star(e: DataFrame) -> DataFrame:
    o = e.select(F.greatest("u", "v").alias("c"), F.least("u", "v").alias("n"))
    mins = o.groupBy("c").agg(F.min("n").alias("mn"))
    j = o.join(mins, "c")
    out = j.select(F.col("n").alias("u"), F.col("mn").alias("v")).unionByName(
        j.select(F.col("c").alias("u"), F.col("mn").alias("v"))
    )
    return _canon(out)


def _checksum(e: DataFrame) -> tuple[int, int]:
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("s"),  # decimal sum: exact + overflow-free under ANSI mode
    ).first()
    return int(row["n"]), int(row["s"])


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    cfg: DedupConfig = DEFAULT,
) -> DataFrame:
    """edges(u, v) [+ optional nodes(id)] -> assignments (id, cluster_id).

    cluster_id = the minimum member id of the component (deterministic,
    matching the local union-find oracle).  Nodes present in ``nodes`` but in
    no edge become singleton clusters of themselves.
    """
    e = _canon(edges.select(F.col(edges.columns[0]).alias("u"),
                            F.col(edges.columns[1]).alias("v")))
    e = e.localCheckpoint(eager=True)
    prev = _checksum(e)
    for it in range(cfg.cc_max_iterations):
        # checkpoint EVERY round (AQE re-plans per action, which defeats
        # shuffle-stage reuse across jobs — without materialization each
        # round's checksum would recompute all prior rounds); lazy form so
        # the checksum action both materializes and measures in ONE job
        e = _small_star(_large_star(e)).localCheckpoint(eager=False)
        cur = _checksum(e)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError("connected components did not converge")

    assign = (
        e.select(F.col("v").alias("id"), F.col("u").alias("cluster_id"))
        .unionByName(
            e.select(F.col("u").alias("id"), F.col("u").alias("cluster_id"))
        )
        .groupBy("id")
        .agg(F.min("cluster_id").alias("cluster_id"))
    )
    if nodes is not None:
        nid = nodes.select(F.col(nodes.columns[0]).alias("id")).distinct()
        assign = (
            nid.join(assign, "id", "left")
            .select("id", F.coalesce("cluster_id", "id").alias("cluster_id"))
        )
    return assign
