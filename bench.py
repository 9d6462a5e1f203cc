"""Bench harness.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {<name>: sec, ...}, "sf": ...,
   "scaling": {"cores_lo": 8, "cores_hi": 32, "docs": N,
               "lo_sec":..., "hi_sec":..., "lo_docs_per_sec":...,
               "hi_docs_per_sec":..., "efficiency":...}}

Two parts:

1. headline queries from ``__spark_entry__`` at $SPARK_GRAFT_SF_DIR
   (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS];
2. the north_rule scaling evidence: the SAME end-to-end dedup pipeline
   (extract-equivalent input -> 4 matchers -> connected components) on the
   SAME deterministic synthetic corpus at local[LO] and local[HI]
   (default 8 vs 32 = the N vs 4N stand-in available in this sandbox),
   reporting docs/sec at both and efficiency = (t_lo/t_hi)/(HI/LO).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
LO_CORES = int(os.environ.get("WEBDEDUP_BENCH_LO", "8"))
BENCH_GROUPS = int(os.environ.get("WEBDEDUP_BENCH_GROUPS", "4000"))
CORPUS_DIR = os.environ.get(
    "WEBDEDUP_BENCH_CORPUS", "/root/repo/.cache/bench_corpus.parquet")

HEADLINE = [
    "token_stats", "quality_scores", "lang_id", "doc_fingerprint",
    "simhash64", "simhash_pairs_combo", "minhash_lsh_pairs",
    "jaccard_pairs", "substring_pairs", "cluster_assignments",
    "representatives", "vector_signatures", "lsh_cosine_pairs",
]


def ensure_corpus(seed: int = 42) -> int:
    """Generate the deterministic bench corpus parquet once; returns #docs."""
    from webdedup.session import get_spark
    from webdedup.sources.corpus import corpus_df

    marker = os.path.join(CORPUS_DIR, "_SUCCESS")
    if not os.path.exists(marker):
        spark = get_spark("webdedup-bench-gen", cores=CPUS)
        df = corpus_df(spark, seed, BENCH_GROUPS, partitions=max(CPUS, 16))
        df.write.mode("overwrite").parquet(CORPUS_DIR)
        spark.stop()
    return _count_parquet(CORPUS_DIR)


def _count_parquet(path: str) -> int:
    import pyarrow.parquet as pq
    n = 0
    for f in os.listdir(path):
        if f.endswith(".parquet"):
            n += pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
    return n


def run_headline() -> tuple[dict[str, float], float]:
    import __spark_entry__ as entrymod
    from webdedup.session import get_spark

    spark = get_spark("webdedup-bench", cores=CPUS)
    qs = entrymod.queries()
    out: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        n = df.count()
        dt = time.time() - t0
        out[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {dt:.2f}s ({n} rows)", file=sys.stderr)
    spark.stop()
    return out, total


def run_pipeline_at(cores: int) -> float:
    from pyspark.sql import functions as F

    from webdedup.config import DEFAULT as CFG
    from webdedup.plans import pipeline
    from webdedup.session import get_spark

    spark = get_spark(f"webdedup-bench-{cores}", cores=cores,
                      shuffle_partitions=max(cores, 8))
    work = tempfile.mkdtemp(prefix=f"webdedup_bench_{cores}_")
    try:
        pages = spark.read.parquet(CORPUS_DIR)
        t0 = time.time()
        res = pipeline.run(pages, work, cfg=CFG, resume=False,
                           record_metrics=False)
        res.assignments.count()
        dt = time.time() - t0
        for stage, sec in res.stage_seconds.items():
            print(f"#   [{cores} cores] {stage}: {sec:.2f}s "
                  f"({res.stage_rows[stage]} rows)", file=sys.stderr)
        return dt
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


def main() -> None:
    queries, total = run_headline()

    n_docs = ensure_corpus()
    t_lo = run_pipeline_at(LO_CORES)
    t_hi = run_pipeline_at(CPUS)
    speedup = t_lo / t_hi if t_hi > 0 else 0.0
    efficiency = speedup / (CPUS / LO_CORES)

    result = {
        "metric": "webdedup_headline_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": queries,
        "sf": os.path.basename(SF_DIR.rstrip("/")),
        "scaling": {
            "cores_lo": LO_CORES,
            "cores_hi": CPUS,
            "docs": n_docs,
            "lo_sec": round(t_lo, 3),
            "hi_sec": round(t_hi, 3),
            "lo_docs_per_sec": round(n_docs / t_lo, 1),
            "hi_docs_per_sec": round(n_docs / t_hi, 1),
            "speedup": round(speedup, 3),
            "efficiency": round(efficiency, 3),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
