"""The end-to-end dedup pipeline: extract -> sign -> match -> cluster ->
represent -> evaluate, with checkpoint-resume and metrics at every stage.

This is the graft of the reference's ``run_pipeline.py main()`` (SURVEY §3.1)
— each numbered stage there maps to a named stage table here.  Run it via
``spark-submit --py-files webdedup.zip driver.py`` on a cluster or through
``run()`` locally.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from webdedup.config import DedupConfig, DEFAULT
from webdedup.functions.extract import with_extracted_text
from webdedup.operators import exact, minhash_lsh, simhash_lsh, substring
from webdedup.operators.components import connected_components
from webdedup.operators.represent import cluster_sizes, representatives
from webdedup.plans import checkpoint, metrics


@dataclass
class PipelineResult:
    assignments: DataFrame
    representatives: DataFrame
    cluster_sizes: DataFrame
    stage_seconds: dict[str, float] = field(default_factory=dict)
    stage_rows: dict[str, int] = field(default_factory=dict)


def run(
    pages: DataFrame,
    work_dir: str,
    cfg: DedupConfig = DEFAULT,
    resume: bool = True,
    matchers: tuple[str, ...] = ("exact", "simhash", "minhash", "substring"),
    simhash_scheme: str = "combo",
    id_col: str = "url",
    record_metrics: bool = True,
) -> PipelineResult:
    """pages: web_pages-shaped input (url, warc_ts, html[, text], lang).

    If a ``text`` column is absent it is produced by the extraction UDF
    (stage ``documents``).  Every stage is materialized as a parquet stage
    table in ``work_dir``; with ``resume=True`` completed stages are read
    back instead of recomputed (checkpoint-resumable restarts, north_rule).
    """
    spark = pages.sparkSession
    times: dict[str, float] = {}
    rows: dict[str, int] = {}

    def stage(name: str, build) -> DataFrame:
        t0 = time.time()
        was_done = checkpoint.exists(work_dir, name)
        df = (checkpoint.read(spark, name=name, work_dir=work_dir)
              if (resume and was_done)
              else checkpoint.materialize(build(), work_dir, name, resume=resume))
        n = df.count()
        dt = time.time() - t0
        times[name], rows[name] = dt, n
        if record_metrics and not (resume and was_done):
            metrics.append_stage_metrics(spark, work_dir, name, n, dt)
            metrics.append_partition_lineage(df, work_dir, name)
        return df

    # 1. extract (reference stage: image decode + feature extract)
    if "text" in pages.columns:
        docs0 = pages.select(F.col(id_col).alias("doc_id"), "text")
    else:
        docs0 = with_extracted_text(pages).select(
            F.col(id_col).alias("doc_id"), "text")
    docs = stage("documents", lambda: docs0)

    # 2. matchers -> candidate edge tables (reference: index+search branches)
    edge_frames: list[DataFrame] = []
    if "exact" in matchers:
        edge_frames.append(stage(
            "edges_exact",
            lambda: exact.exact_dup_edges(docs).select(
                F.col("src").alias("u"), F.col("dst").alias("v")),
        ))
    if "simhash" in matchers:
        def _sim():
            e, overflow = simhash_lsh.simhash_edges(
                docs, cfg=cfg, scheme=simhash_scheme)
            checkpoint.write(
                overflow.groupBy("table_id", "band_key")
                .agg(F.count(F.lit(1)).alias("n_overflow")),
                work_dir, "simhash_bucket_overflow")
            return e.select(F.col("a").alias("u"), F.col("b").alias("v"))
        edge_frames.append(stage("edges_simhash", _sim))
    if "minhash" in matchers:
        edge_frames.append(stage(
            "edges_minhash",
            lambda: minhash_lsh.minhash_pairs(
                docs, cfg=cfg, threshold=cfg.jaccard_threshold, cap=True
            ).select(F.col("a").alias("u"), F.col("b").alias("v")),
        ))
    if "substring" in matchers:
        edge_frames.append(stage(
            "edges_substring",
            lambda: substring.substring_pairs(
                docs, cfg=cfg, max_df=cfg.max_bucket_size
            ).select(F.col("a").alias("u"), F.col("b").alias("v")),
        ))

    # 3. union + connected components (reference: union-find clustering)
    def _cc():
        edges = edge_frames[0]
        for e in edge_frames[1:]:
            edges = edges.unionByName(e)
        return connected_components(edges, nodes=docs.select("doc_id"), cfg=cfg)
    assignments = stage("assignments", _cc)

    # 4. representatives + cluster stats (reference: choose_representatives)
    docs_scored = docs.withColumn("n_chars", F.length("text"))
    reps = stage("representatives",
                 lambda: representatives(assignments, docs_scored,
                                         id_col="doc_id", score_col="n_chars"))
    sizes = stage("cluster_sizes", lambda: cluster_sizes(assignments))

    return PipelineResult(assignments, reps, sizes, times, rows)
