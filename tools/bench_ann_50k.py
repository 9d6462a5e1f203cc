"""ANN scale/skew evidence: lsh_cosine_pairs on a 50k-vector table with a
REAL hot-bucket workload (5,000 planted near-identical duplicates collapse
into the same band keys), A/B-ing the lossless hot-bucket grid split
(round-4 ADVICE fix) against the monolithic-bucket path.

The r3 recording (BENCH.md §ANN-at-25x) predates the grid split; this tool
re-validates at the same scale that (a) results are identical with the
split engaged, (b) wall time does not regress, (c) planted recall stays
1.0 — measured with a semi-join count, never collecting the ~4M pair rows.

Usage:  python tools/bench_ann_50k.py [cores] [threshold] [probe_bits] [cap]
One config per invocation (cap = max_bucket_rows; 10000000 disables the
grid); prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BASE, N_DUP, DIM, K = 45_000, 5_000, 64, 24
CACHE = "/root/repo/.cache/ann_50k.parquet"


def ensure_table() -> None:
    """Write the 50k table with pyarrow directly (driver-side createDataFrame
    of 50k float lists measured minutes; this is seconds).

    Geometry: cluster noise σ=0.75 per dim over ||center||≈8 puts the bulk
    of same-cluster cosines ≈0.6-0.7 — hot BAND BUCKETS (the skew stress)
    without a threshold-0.9 output explosion; the 5,000 planted
    near-identical dups (noise 1e-3) are the true >=0.9 pairs."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.exists(os.path.join(CACHE, "_SUCCESS")):
        return
    rng = np.random.default_rng(7)
    centers = rng.normal(0.0, 1.0, (K, DIM))
    assign = rng.integers(0, K, N_BASE)
    X = centers[assign] + rng.normal(0.0, 0.75, (N_BASE, DIM))
    dups = X[:N_DUP] + rng.normal(0.0, 1e-3, (N_DUP, DIM))
    allv = np.vstack([X, dups]).astype(np.float32)
    os.makedirs(CACHE, exist_ok=True)
    n = len(allv)
    per = -(-n // 16)
    for f in range(16):
        lo, hi = f * per, min(n, (f + 1) * per)
        tbl = pa.table({
            "vec_id": pa.array(range(lo, hi), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(allv[lo:hi].ravel(), pa.float32()), DIM).cast(
                pa.list_(pa.float32())),
        })
        pq.write_table(tbl, os.path.join(CACHE, f"part-{f:05d}.parquet"))
    open(os.path.join(CACHE, "_SUCCESS"), "w").close()


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    thr = float(sys.argv[2]) if len(sys.argv) > 2 else 0.9
    probe = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    cap = int(sys.argv[4]) if len(sys.argv) > 4 else 2048

    from pyspark.sql import functions as F

    from webdedup.config import DEFAULT as CFG
    from webdedup.operators import similarity
    from webdedup.session import get_spark

    ensure_table()
    spark = get_spark(f"webdedup-ann50k-{cores}", cores=cores,
                      shuffle_partitions=max(cores * 2, 8))
    emb = spark.read.parquet(CACHE).localCheckpoint()
    emb.count()
    planted = spark.range(N_DUP).select(
        F.col("id").alias("a"), (F.col("id") + N_BASE).alias("b"))

    t0 = time.time()
    pairs = similarity.lsh_cosine_pairs(
        emb, threshold=thr, cfg=CFG, probe_bits=probe,
        max_bucket_rows=cap).localCheckpoint(eager=False)
    n = pairs.count()
    wall = round(time.time() - t0, 1)
    hit = pairs.join(planted, ["a", "b"], "left_semi").count()
    print(json.dumps({"metric": "ann50k_lsh", "cores": cores,
                      "threshold": thr, "probe_bits": probe,
                      "max_bucket_rows": cap, "wall_sec": wall,
                      "pairs": n,
                      "planted_recall": round(hit / N_DUP, 4)}),
          flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
