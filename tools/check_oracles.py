"""Local mimic of the driver's Spark-vs-DuckDB correctness gate.

Runs every ``__spark_entry__.queries()`` entry at the given sf dir and
compares against ``oracle_sql()`` through DuckDB: row count, column names,
and order-insensitive value equality (sorted rows, stringified).

Usage:  python tools/check_oracles.py [sf_dir] [query ...]
        python tools/check_oracles.py /root/testdata/sf0.1 --scalars
        python tools/check_oracles.py /root/testdata/sf0.1 --pairs

``--scalars`` expands to the per-doc scalar/text queries that are
DuckDB-feasible at 45k docs (sf0.1): richer real text exercises regex/
whitespace edge cases the 500-doc fixtures cannot (VERDICT r3 #6).

``--pairs`` expands to the pair/cluster/eval twins (VERDICT r4 #1) —
the matcher surface whose driver checks run at 500 docs only — at
sf0.1's 5k real-text document table (8 natural dup groups), where the
recursive-CTE connected-components twin is still DuckDB-feasible.  In
this mode a query that returns ZERO Spark rows FAILS even if the oracle
agrees: the point is verifying pair semantics on real collisions, and
0 == 0 would be vacuous.
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from webdedup.session import get_spark
from webdedup.sources.tables import TABLES


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}"
    return str(v)


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in idx) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    SCALARS = {"token_stats", "subtoken_stats", "quality_scores", "lang_id",
               "doc_fingerprint", "simhash64", "minhash_sig", "shingle_stats",
               "content_hashes", "exact_dup_groups", "exact_dup_groups_planted",
               "source_labels", "source_dup_stats", "lang_stats",
               "topk_per_lang", "media_meta",
               "embedding_norms", "vector_signatures", "media_frames",
               "windowed_event_stats", "event_props_stats"}
    PAIRS = {"simhash_pairs", "simhash_pairs_combo", "jaccard_pairs",
             "minhash_lsh_pairs", "minhash_lsh_pairs_collapsed",
             "minhash_est_jaccard", "substring_pairs",
             "cluster_assignments", "representatives", "duplicate_sets",
             "pipeline_eval", "matcher_agreement"}
    args = sys.argv[2:]
    require_rows = False
    if "--scalars" in args:
        only = SCALARS
    elif "--pairs" in args:
        only = PAIRS
        require_rows = True
    else:
        only = {a for a in args if not a.startswith("--")}
    spark = get_spark(cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        if name not in oracles:
            print(f"{name:24s} rows-only: {len(srows)} rows")
            continue
        try:
            ores = con.sql(oracles[name])
            ocols = [c for c in ores.columns]
            orows = ores.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"{name:24s} ORACLE SQL ERROR: {exc}")
            failures += 1
            continue
        ok_cols = sorted(scols) == sorted(ocols)
        a, b = norm_rows(scols, srows), norm_rows(ocols, orows)
        ok_rows = a == b
        if require_rows and len(srows) == 0:
            ok_rows = False
            print(f"{name:24s} VACUOUS: 0 spark rows in --pairs mode")
        status = "OK" if (ok_cols and ok_rows) else "MISMATCH"
        print(f"{name:24s} {status}  spark={len(srows)} duck={len(orows)} "
              f"cols={'OK' if ok_cols else (scols, ocols)}")
        if not ok_rows and len(a) == len(b):
            for x, y in zip(a, b):
                if x != y:
                    print(f"   first diff:\n     spark={x}\n     duck ={y}")
                    break
        failures += 0 if (ok_cols and ok_rows) else 1
    spark.stop()
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
