"""Signature-stage hash-scheme benchmark (VERDICT r3 #3).

The fused signature stage is the pipeline's largest cost at scale (113s of
195s at 250k docs / 4 cores, BENCH.md §250k) and its floor is one md5 per
shingle string.  ``hash_scheme='tokmix'`` replaces that with one md5 per
DISTINCT TOKEN (already paid by SimHash) plus a vectorized numpy window
mix.  This tool measures the stage alone, md5 vs tokmix, same corpus/cores.

Usage:  python tools/bench_sig_scheme.py [cores] [corpus_dir] [attempts]
Prints one JSON line per scheme + a summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    corpus = (sys.argv[2] if len(sys.argv) > 2
              else "/root/repo/.cache/bench_corpus_250k.parquet")
    attempts = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from dataclasses import replace

    from pyspark.sql import functions as F

    from webdedup.config import DEFAULT as CFG
    from webdedup.functions.signatures import all_signatures
    from webdedup.session import get_spark

    spark = get_spark(f"webdedup-sigbench-{cores}", cores=cores,
                      shuffle_partitions=max(cores * 2, 8))
    docs = (spark.read.parquet(corpus)
            .select(F.xxhash64("url").alias("doc_id"), "text")
            .repartition(cores * 4)
            .localCheckpoint())  # scan/repartition cost paid once, up front
    n = docs.count()
    out = {}
    for scheme in ("md5", "tokmix"):
        cfg = replace(CFG, hash_scheme=scheme)
        walls = []
        for _ in range(attempts):
            t0 = time.time()
            rows = all_signatures(docs, cfg=cfg).count()
            walls.append(round(time.time() - t0, 1))
            assert rows == n
        out[scheme] = {"wall_sec": min(walls), "attempts_sec": walls,
                       "docs_per_sec": round(n / min(walls), 1)}
        print(json.dumps({"scheme": scheme, "docs": n, "cores": cores,
                          **out[scheme]}))
    print(json.dumps({
        "metric": "signature_stage_speedup_tokmix_vs_md5",
        "docs": n, "cores": cores,
        "value": round(out["md5"]["wall_sec"] / out["tokmix"]["wall_sec"], 2),
        "md5_sec": out["md5"]["wall_sec"],
        "tokmix_sec": out["tokmix"]["wall_sec"]}))
    spark.stop()


if __name__ == "__main__":
    main()
