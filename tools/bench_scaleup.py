"""Scale-up evidence run: the full 4-matcher pipeline + CC on the 250k-doc
corpus (5.5x the recorded 45k bench corpus), per-stage wall times.

Purpose: show that the per-stage job floors (~0.3-0.5s/stage on this host)
amortize as the input grows — docs/s at 250k should meet or beat the 45k
run's at the same core count, evidencing that recorded small-corpus numbers
are floor-bound, not throughput-bound.  Results land in BENCH.md.

Usage:  python tools/bench_scaleup.py [cores] [corpus_dir] [--production]
Prints one JSON line: {"docs": N, "cores": C, "total_sec": T,
"docs_per_sec": R, "stages": {...}}.

``--production`` runs the documented production dials — hash_scheme=
'tokmix' + minhash_fast_accept='auto' — instead of the oracle-exact
defaults; the mode is recorded in the JSON.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    cores = int(args[0]) if args else 4
    corpus = (args[1] if len(args) > 1
              else "/root/repo/.cache/bench_corpus_250k.parquet")

    from webdedup.config import DEFAULT as CFG
    from webdedup.plans import pipeline
    from webdedup.session import get_spark

    spark = get_spark(f"webdedup-scaleup-{cores}", cores=cores,
                      shuffle_partitions=max(cores * 2, 8))
    work = tempfile.mkdtemp(
        prefix=f"webdedup_scaleup_{cores}_",
        dir="/dev/shm" if os.path.isdir("/dev/shm") else None)
    production = "--production" in sys.argv
    if production:
        from dataclasses import replace
        cfg = replace(CFG, hash_scheme="tokmix")
        fast = "auto"
    else:
        cfg, fast = CFG, None
    try:
        pages = spark.read.parquet(corpus)
        n_docs = pages.count()
        t0 = time.time()
        res = pipeline.run(pages, work, cfg=cfg, resume=False,
                           record_metrics=False, minhash_fast_accept=fast)
        res.assignments.count()
        total = time.time() - t0
        out = {
            "docs": n_docs,
            "cores": cores,
            "mode": "production" if production else "default",
            "total_sec": round(total, 1),
            "docs_per_sec": round(n_docs / total, 1),
            "stages": {k: round(v, 2) for k, v in res.stage_seconds.items()},
            "stage_rows": dict(res.stage_rows),
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
