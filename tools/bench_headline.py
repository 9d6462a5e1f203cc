"""Round-7 measurement harness (bench.py is FROZEN for the driver).

Times individual headline queries with the SAME methodology as bench.py
(``df.count()`` on the same session config, memo reset per attempt), and
optionally captures ``explain("formatted")`` plans to plans/r07/.

Usage:
    python tools/bench_headline.py [--attempts N] [--sf DIR]
        [--plans SUFFIX] [--noop] [query ...]

``--plans before`` writes plans/r07/<query>_before.txt for each query run.
``--noop`` times a noop-sink write instead of count (guide §1.4) — isolates
computation of EVERY column from the count short-circuit.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from webdedup.session import get_spark

HEADLINE = [
    "token_stats", "subtoken_stats", "quality_scores", "lang_id",
    "doc_fingerprint",
    "simhash64", "simhash_pairs_combo", "minhash_lsh_pairs",
    "minhash_est_jaccard", "jaccard_pairs", "substring_pairs",
    "cluster_assignments", "representatives", "duplicate_sets",
    "pipeline_eval",
    "vector_signatures", "lsh_cosine_pairs", "ivf2_cosine_pairs",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", default=None)
    ap.add_argument("--attempts", type=int, default=2)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--plans", default=None,
                    help="write plans/r07/<q>_<SUFFIX>.txt explain output")
    ap.add_argument("--noop", action="store_true")
    args = ap.parse_args()
    names = args.queries or HEADLINE

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("webdedup-bench-extra", cores=cpus)

    def _warm(batches):
        yield from batches
    spark.range(1000).repartition(4).mapInPandas(_warm, "id long").count()

    qs = entrymod.queries()
    plans_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r07")
    if args.plans:
        os.makedirs(plans_dir, exist_ok=True)

    results: dict[str, list[float]] = {n: [] for n in names}
    for att in range(args.attempts):
        entrymod.reset_memo()
        for name in names:
            spark.sparkContext.setJobDescription(f"r07 bench: {name}")
            t0 = time.time()
            df = qs[name](spark, args.sf)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
                n = -1
            else:
                n = df.count()
            dt = time.time() - t0
            results[name].append(dt)
            print(f"[attempt {att + 1}] {name}: {dt:.3f}s ({n} rows)",
                  flush=True)
            if args.plans and att == 0:
                path = os.path.join(plans_dir, f"{name}_{args.plans}.txt")
                with open(path, "w") as f:
                    f.write(df._jdf.queryExecution().explainString(
                        spark._jvm.org.apache.spark.sql.execution
                        .ExplainMode.fromString("formatted")))
            spark.sparkContext.setJobDescription(None)
    print("--- min per query ---")
    tot = 0.0
    for name in names:
        m = min(results[name])
        tot += m
        print(f"{name}: {m:.3f}")
    print(f"TOTAL(min): {tot:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
