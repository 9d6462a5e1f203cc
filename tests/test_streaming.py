"""Structured Streaming ingest: enrichment + watermarked exact-dedup.

The reference has no streaming (SURVEY §2.10); this covers the graft's
streaming surface: pages stream -> extract/sign -> dropDuplicates on
content hash -> parquet sink, exactly-once via checkpoint dir.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time

import pytest
from pyspark.sql import functions as F

from webdedup.functions.signatures import _simhash_of_text
from webdedup.sources import corpus
from webdedup.streaming import ingest


@pytest.fixture()
def stream_dirs():
    root = tempfile.mkdtemp(prefix="webdedup_stream_")
    d = {k: os.path.join(root, k) for k in ("in", "out", "ckpt")}
    os.makedirs(d["in"])
    yield d
    shutil.rmtree(root, ignore_errors=True)


def test_stream_dedups_and_signs(spark, stream_dirs):
    rows = corpus.corpus_rows(42, 12)
    df = spark.createDataFrame(rows, schema=corpus.PAGE_KIND_SCHEMA) \
        .select("url", "warc_ts", "html", "text", "lang")
    df.coalesce(2).write.mode("overwrite").parquet(stream_dirs["in"])

    stream = ingest.read_page_stream(spark, stream_dirs["in"],
                                     max_files_per_trigger=1)
    enriched = ingest.enrich_stream(stream)
    deduped = ingest.dedup_stream(enriched)
    q = ingest.write_signature_stream(
        deduped, stream_dirs["out"], stream_dirs["ckpt"], once=True)
    q.awaitTermination(120)

    out = spark.read.parquet(stream_dirs["out"])
    got = {r["url"]: r for r in out.collect()}
    texts = {r["url"]: r["text"] for r in rows}
    # exact duplicates suppressed: distinct content hashes only
    n_distinct_texts = len(set(texts.values()))
    assert out.count() == n_distinct_texts
    # signatures match the batch implementation
    for url, r in list(got.items())[:10]:
        assert r["simhash"] == _simhash_of_text(texts[url])
    assert set(out.columns) >= {"url", "warc_ts", "text", "lang",
                                "content_sha", "simhash"}


def test_stream_resume_is_exactly_once(spark, stream_dirs):
    rows = corpus.corpus_rows(42, 8)
    df = spark.createDataFrame(rows, schema=corpus.PAGE_KIND_SCHEMA) \
        .select("url", "warc_ts", "html", "text", "lang")
    df.coalesce(1).write.mode("overwrite").parquet(stream_dirs["in"])

    for _ in range(2):  # second run resumes from checkpoint: no new rows
        stream = ingest.read_page_stream(spark, stream_dirs["in"])
        q = ingest.write_signature_stream(
            ingest.dedup_stream(ingest.enrich_stream(stream)),
            stream_dirs["out"], stream_dirs["ckpt"], once=True)
        q.awaitTermination(120)

    out = spark.read.parquet(stream_dirs["out"])
    assert out.count() == out.select("content_sha").distinct().count()


def test_incremental_matcher_covers_all_pairs(spark, stream_dirs):
    """Union over micro-batches of (new x new) ∪ (new x store) pairs must
    equal the BATCH brute-force Hamming<=5 pair set — every pair found
    exactly once, when its later member arrives."""
    from webdedup import oracle
    from webdedup.config import DEFAULT as CFG
    from webdedup.streaming import incremental

    rows = corpus.corpus_rows(42, 12)
    df = spark.createDataFrame(rows, schema=corpus.PAGE_KIND_SCHEMA) \
        .select("url", "warc_ts", "html", "text", "lang")
    df.repartition(3).write.mode("overwrite").parquet(stream_dirs["in"])

    q = incremental.incremental_dedup(
        spark, stream_dirs["in"], stream_dirs["out"], stream_dirs["ckpt"],
        cfg=CFG, max_files_per_trigger=1, once=True)
    q.awaitTermination(180)

    got_df = spark.read.parquet(
        stream_dirs["out"] + "/" + incremental.PAIRS_TABLE)
    got = {(min(r["a"], r["b"]), max(r["a"], r["b"]))
           for r in got_df.collect()}
    texts = {r["url"]: r["text"] for r in rows}
    exp = oracle.simhash_pairs(texts, CFG)
    assert got == exp, (len(got), len(exp))
    # no duplicate emissions across batches
    assert got_df.count() == got_df.select("a", "b").distinct().count()

    # compaction folds finished batch partitions into a new base GENERATION
    # committed through the manifest; the latest-per-id store view must be
    # unchanged (VERDICT r3 #7, re-based on the r6 manifest)
    from pyspark.sql import Window

    def latest(df):
        w = Window.partitionBy("id").orderBy(F.desc("_batch_id"))
        return {(r["id"], r["simhash"]) for r in
                df.withColumn("_rk", F.row_number().over(w))
                .filter("_rk = 1").select("id", "simhash").collect()}

    before = latest(incremental.read_store(spark, stream_dirs["out"]))
    merged = incremental.compact_store(spark, stream_dirs["out"])
    assert merged >= 1
    assert latest(incremental.read_store(spark, stream_dirs["out"])) == before
    man = incremental.load_manifest(stream_dirs["out"])
    assert man["generation"] == 1 and man["base"].startswith("sig_store_base")
    assert len(man["batches"]) == 1, man  # only the newest kept batch
    # dereferenced dirs are TOMBSTONED (grace generation), not yet deleted
    assert len(man["tombstones"]) == merged
    for t in man["tombstones"]:
        assert os.path.isdir(os.path.join(stream_dirs["out"], t["path"]))

    # replay with the same checkpoint: availableNow finds no new files,
    # output unchanged (idempotent partition-overwrite commits)
    n_before = got_df.count()
    q2 = incremental.incremental_dedup(
        spark, stream_dirs["in"], stream_dirs["out"], stream_dirs["ckpt"],
        cfg=CFG, max_files_per_trigger=1, once=True)
    q2.awaitTermination(180)
    assert spark.read.parquet(
        stream_dirs["out"] + "/" + incremental.PAIRS_TABLE).count() == n_before


def _page(url, ts, text):
    return (url, ts, f"<p>{text}</p>".encode(), text, "en")


def test_late_row_beyond_watermark_is_dropped(spark, stream_dirs):
    """The documented lateness contract (windows.py): a row arriving after
    the watermark closed its window is DROPPED — the emitted window row is
    final (append mode emits exactly once) and is never re-stated."""
    import datetime as dt

    from webdedup.streaming import windows as win

    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    run1 = [_page("u1", t0 + dt.timedelta(minutes=1), "alpha text"),
            _page("u2", t0 + dt.timedelta(minutes=2), "beta text"),
            _page("s1", t0 + dt.timedelta(hours=6), "sentinel one")]
    spark.createDataFrame(run1, schema=corpus.WEB_PAGES_SCHEMA) \
        .coalesce(1).write.mode("append").parquet(stream_dirs["in"])

    def run_once():
        stream = ingest.enrich_stream(
            ingest.read_page_stream(spark, stream_dirs["in"],
                                    max_files_per_trigger=1))
        q = win.write_window_stats_stream(
            win.window_dup_stats(stream, window="5 minutes",
                                 watermark="2 minutes"),
            stream_dirs["out"], stream_dirs["ckpt"], once=True)
        q.awaitTermination(180)

    run_once()
    w1 = [r for r in spark.read.parquet(stream_dirs["out"]).collect()
          if r["window_start"] == t0]
    assert len(w1) == 1 and w1[0]["n_pages"] == 2

    # a late arrival INSIDE the closed [00:00, 00:05) window, while the
    # restored watermark is ~05:58 — must not emit or restate anything
    run2 = [_page("late", t0 + dt.timedelta(minutes=3), "late text"),
            _page("s2", t0 + dt.timedelta(hours=7), "sentinel two")]
    spark.createDataFrame(run2, schema=corpus.WEB_PAGES_SCHEMA) \
        .coalesce(1).write.mode("append").parquet(stream_dirs["in"])
    run_once()

    out = spark.read.parquet(stream_dirs["out"]).collect()
    w1 = [r for r in out if r["window_start"] == t0]
    assert len(w1) == 1, "closed window was re-stated"
    assert w1[0]["n_pages"] == 2, "late row leaked into a closed window"
    # the run-1 sentinel's window closed in run 2 (watermark advanced)
    s1w = [r for r in out
           if r["window_start"] == t0 + dt.timedelta(hours=6)]
    assert len(s1w) == 1 and s1w[0]["n_pages"] == 1


def test_dedup_stream_state_evicts_after_watermark(spark, stream_dirs):
    """dropDuplicatesWithinWatermark contract: a duplicate INSIDE the
    watermark window is suppressed; once the watermark passes, the key's
    state is EVICTED and a re-crawl of the same content is emitted again
    (the periodic batch pipeline collapses those)."""
    import datetime as dt

    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    run1 = [_page("x1", t0, "repeat content"),
            _page("x2", t0 + dt.timedelta(minutes=10), "repeat content"),
            _page("s1", t0 + dt.timedelta(hours=6), "sentinel one")]
    spark.createDataFrame(run1, schema=corpus.WEB_PAGES_SCHEMA) \
        .coalesce(1).write.mode("append").parquet(stream_dirs["in"])

    def run_once():
        stream = ingest.read_page_stream(spark, stream_dirs["in"],
                                         max_files_per_trigger=1)
        q = ingest.write_signature_stream(
            ingest.dedup_stream(ingest.enrich_stream(stream),
                                watermark="1 hour"),
            stream_dirs["out"], stream_dirs["ckpt"], once=True)
        q.awaitTermination(180)

    run_once()
    out = spark.read.parquet(stream_dirs["out"])
    reps = out.filter(F.col("text") == "repeat content").collect()
    assert len(reps) == 1 and reps[0]["url"] == "x1", \
        "within-watermark duplicate not suppressed"

    # restored watermark ~05:00 evicted x1's state (expiry 01:00): the
    # re-crawl emits again; its own immediate duplicate is suppressed
    run2 = [_page("x3", t0 + dt.timedelta(hours=6, minutes=30),
                  "repeat content"),
            _page("x4", t0 + dt.timedelta(hours=6, minutes=31),
                  "repeat content")]
    spark.createDataFrame(run2, schema=corpus.WEB_PAGES_SCHEMA) \
        .coalesce(1).write.mode("append").parquet(stream_dirs["in"])
    run_once()

    reps = spark.read.parquet(stream_dirs["out"]) \
        .filter(F.col("text") == "repeat content").collect()
    assert len(reps) == 2, "evicted key was not re-emitted on re-crawl"
    assert {r["url"] for r in reps} == {"x1", "x3"}


def test_windowed_dup_stats_batch_parity(spark, stream_dirs):
    """Streaming windowed dup-rate (chained window aggs, append mode) must
    equal the same computation run as a batch query, for every window the
    watermark closed."""
    import datetime as dt

    from webdedup.streaming import windows as win

    rows = corpus.corpus_rows(42, 20)
    df = spark.createDataFrame(rows, schema=corpus.PAGE_KIND_SCHEMA) \
        .select("url", "warc_ts", "html", "text", "lang")
    # sentinel far in the future: advances the final watermark past every
    # real window so availableNow emits them all (its own window stays open)
    sentinel_ts = max(r["warc_ts"] for r in rows) + dt.timedelta(hours=6)
    sent = spark.createDataFrame(
        [{**rows[0], "url": "sentinel://flush", "warc_ts": sentinel_ts}],
        schema=corpus.PAGE_KIND_SCHEMA).select(
        "url", "warc_ts", "html", "text", "lang")
    df.unionByName(sent).coalesce(2).write.mode("overwrite") \
        .parquet(stream_dirs["in"])

    stream = ingest.enrich_stream(
        ingest.read_page_stream(spark, stream_dirs["in"],
                                max_files_per_trigger=1))
    q = win.write_window_stats_stream(
        win.window_dup_stats(stream, window="5 minutes",
                             watermark="2 minutes"),
        stream_dirs["out"], stream_dirs["ckpt"], once=True)
    q.awaitTermination(180)

    got = {tuple(r) for r in spark.read.parquet(stream_dirs["out"]).collect()}

    batch = ingest.enrich_stream(
        spark.read.parquet(stream_dirs["in"]))
    expected = {tuple(r) for r in win.window_dup_stats(
        batch, window="5 minutes", watermark="2 minutes")
        .filter(F.col("window_end") <= sentinel_ts).collect()}
    assert got == expected and len(got) >= 3
    for r in spark.read.parquet(stream_dirs["out"]).collect():
        assert r["n_pages"] >= r["n_distinct"]
        assert r["n_exact_dups"] == r["n_pages"] - r["n_distinct"]


def test_sliding_window_dup_stats_batch_parity(spark, stream_dirs):
    """Sliding-window freshness monitor (three chained window aggs): the
    streamed output must equal the batch run of the SAME operator for every
    closed window, each event must appear in window/slide windows, and the
    tumbling monitor must agree wherever their windows coincide."""
    import datetime as dt

    from webdedup.streaming import windows as win

    rows = corpus.corpus_rows(42, 20)
    df = spark.createDataFrame(rows, schema=corpus.PAGE_KIND_SCHEMA) \
        .select("url", "warc_ts", "html", "text", "lang")
    sentinel_ts = max(r["warc_ts"] for r in rows) + dt.timedelta(hours=6)
    sent = spark.createDataFrame(
        [{**rows[0], "url": "sentinel://flush", "warc_ts": sentinel_ts}],
        schema=corpus.PAGE_KIND_SCHEMA).select(
        "url", "warc_ts", "html", "text", "lang")
    df.unionByName(sent).coalesce(2).write.mode("overwrite") \
        .parquet(stream_dirs["in"])

    stream = ingest.enrich_stream(
        ingest.read_page_stream(spark, stream_dirs["in"],
                                max_files_per_trigger=1))
    q = win.write_window_stats_stream(
        win.sliding_window_dup_stats(stream, window="4 minutes",
                                     slide="1 minute",
                                     watermark="2 minutes"),
        stream_dirs["out"], stream_dirs["ckpt"], once=True)
    q.awaitTermination(180)

    got = {tuple(r) for r in spark.read.parquet(stream_dirs["out"]).collect()}

    batch = ingest.enrich_stream(spark.read.parquet(stream_dirs["in"]))
    expected_rows = win.sliding_window_dup_stats(
        batch, window="4 minutes", slide="1 minute", watermark="2 minutes") \
        .filter(F.col("window_end") <= sentinel_ts).collect()
    expected = {tuple(r) for r in expected_rows}
    assert got == expected and len(got) >= 4
    # every event lands in window/slide = 4 windows: total page-slots in
    # the sliding stats are exactly 4x the event count (sentinel excluded)
    n_events = batch.filter(F.col("warc_ts") < sentinel_ts).count()
    assert sum(r["n_pages"] for r in expected_rows) == 4 * n_events
    # slide == window degenerates to the tumbling monitor exactly
    tumb = {tuple(r) for r in win.window_dup_stats(
        batch, window="4 minutes", watermark="2 minutes")
        .filter(F.col("window_end") <= sentinel_ts).collect()}
    degen = {tuple(r) for r in win.sliding_window_dup_stats(
        batch, window="4 minutes", slide="4 minutes", watermark="2 minutes")
        .filter(F.col("window_end") <= sentinel_ts).collect()}
    assert degen == tumb
    for r in expected_rows:
        assert r["n_pages"] >= r["n_distinct"] >= 1
        assert r["n_exact_dups"] == r["n_pages"] - r["n_distinct"]


def test_compaction_between_microbatches_and_replay(spark, stream_dirs):
    """VERDICT r4 #8: compaction interleaved between micro-batch runs, then
    a forced REPLAY of the newest batch (its checkpoint commit marker
    deleted — the exact crash window compact_store's keep_last protects):
    the pair table must end up complete (== batch brute force) and free of
    duplicate emissions, with at least one pair spanning the compacted
    store and a post-compaction batch."""
    from webdedup import oracle
    from webdedup.config import DEFAULT as CFG
    from webdedup.streaming import incremental

    rows = corpus.corpus_rows(42, 12)
    old_urls = {r["url"] for r in rows[:8]}
    df_old = spark.createDataFrame(rows[:8], schema=corpus.PAGE_KIND_SCHEMA) \
        .select("url", "warc_ts", "html", "text", "lang")
    df_new = spark.createDataFrame(rows[8:], schema=corpus.PAGE_KIND_SCHEMA) \
        .select("url", "warc_ts", "html", "text", "lang")
    df_old.repartition(2).write.mode("append").parquet(stream_dirs["in"])

    def run_once():
        q = incremental.incremental_dedup(
            spark, stream_dirs["in"], stream_dirs["out"], stream_dirs["ckpt"],
            cfg=CFG, max_files_per_trigger=1, once=True)
        q.awaitTermination(180)

    run_once()  # two micro-batches (two files)
    assert incremental.compact_store(spark, stream_dirs["out"]) == 1

    # new docs arrive AFTER compaction: their batch must match against the
    # compacted base partition
    df_new.coalesce(1).write.mode("append").parquet(stream_dirs["in"])
    run_once()
    pairs_p = stream_dirs["out"] + "/" + incremental.PAIRS_TABLE
    n_after = spark.read.parquet(pairs_p).count()

    # force a replay of the NEWEST batch: drop its commit marker so the
    # engine re-executes it from the offsets log against the same store
    commits_dir = os.path.join(stream_dirs["ckpt"], "commits")
    newest = sorted(f for f in os.listdir(commits_dir)
                    if not f.startswith("."))[-1]
    os.remove(os.path.join(commits_dir, newest))
    crc = os.path.join(commits_dir, f".{newest}.crc")
    if os.path.exists(crc):  # stale Hadoop checksum would fail the rewrite
        os.remove(crc)
    run_once()

    got_df = spark.read.parquet(pairs_p)
    got = {(min(r["a"], r["b"]), max(r["a"], r["b"]))
           for r in got_df.collect()}
    texts = {r["url"]: r["text"] for r in rows}
    exp = oracle.simhash_pairs(texts, CFG)
    assert got == exp, (len(got), len(exp))
    assert got_df.count() == n_after == len(got)  # replay added nothing
    cross = {(a, b) for a, b in got
             if (a in old_urls) != (b in old_urls)}
    assert cross, "fixture must exercise the store-vs-new join path"


def test_compact_store_during_active_stream(spark, stream_dirs):
    """r5 VERDICT #5: with the manifest, compaction runs CONCURRENTLY with
    an active stream (the r4/r5 versions had to refuse — the lazy
    directory listing raced deletion).  A live processingTime stream
    ingests files while compact_store runs on the driver thread; the final
    pair table must still equal the batch brute force with no duplicate
    emissions, and the store view must survive both."""
    from webdedup import oracle
    from webdedup.config import DEFAULT as CFG
    from webdedup.streaming import incremental

    rows = corpus.corpus_rows(42, 12)
    df = spark.createDataFrame(rows, schema=corpus.PAGE_KIND_SCHEMA) \
        .select("url", "warc_ts", "html", "text", "lang")
    # first two files before the stream starts; the rest drip in while
    # it runs (and while compaction runs)
    parts = df.randomSplit([1.0, 1.0, 1.0, 1.0], seed=1)
    for p in parts[:2]:
        p.coalesce(1).write.mode("append").parquet(stream_dirs["in"])
    q = incremental.incremental_dedup(
        spark, stream_dirs["in"], stream_dirs["out"], stream_dirs["ckpt"],
        cfg=CFG, max_files_per_trigger=1, once=False)  # stays active
    try:
        assert q.isActive
        deadline = time.time() + 120
        compactions = 0
        for p in parts[2:]:
            p.coalesce(1).write.mode("append").parquet(stream_dirs["in"])
            # compact WHILE the stream is active — must never raise
            compactions += incremental.compact_store(
                spark, stream_dirs["out"])
        # drain: wait until all 4 input files are processed
        while time.time() < deadline:
            man = incremental.load_manifest(stream_dirs["out"])
            store = incremental.read_store(spark, stream_dirs["out"])
            if store is not None and store.select("id").distinct().count() \
                    == len(rows):
                break
            time.sleep(1)
    finally:
        q.stop()
        q.awaitTermination(60)
    # one final compaction after the stream stopped folds the stragglers
    incremental.compact_store(spark, stream_dirs["out"])
    got_df = spark.read.parquet(
        stream_dirs["out"] + "/" + incremental.PAIRS_TABLE)
    got = {(min(r["a"], r["b"]), max(r["a"], r["b"]))
           for r in got_df.collect()}
    texts = {r["url"]: r["text"] for r in rows}
    assert got == oracle.simhash_pairs(texts, CFG), (len(got))
    assert got_df.count() == got_df.select("a", "b").distinct().count()
    store = incremental.read_store(spark, stream_dirs["out"])
    assert store.select("id").distinct().count() == len(rows)


def test_manifest_snapshot_survives_one_compaction(spark, stream_dirs):
    """The grace-generation contract: a reader that pinned its snapshot
    BEFORE a compaction still finds every file after it (physical deletion
    is deferred one generation); only a second compaction removes them."""
    from webdedup.config import DEFAULT as CFG
    from webdedup.streaming import incremental

    rows = corpus.corpus_rows(7, 6)
    df = spark.createDataFrame(rows, schema=corpus.PAGE_KIND_SCHEMA) \
        .select("url", "warc_ts", "html", "text", "lang")
    df.repartition(3).write.mode("append").parquet(stream_dirs["in"])
    q = incremental.incremental_dedup(
        spark, stream_dirs["in"], stream_dirs["out"], stream_dirs["ckpt"],
        cfg=CFG, max_files_per_trigger=1, once=True)
    q.awaitTermination(180)

    pinned = incremental.read_store(spark, stream_dirs["out"])  # lazy scan
    n_expected = pinned.count()
    assert incremental.compact_store(spark, stream_dirs["out"]) >= 1
    # the pinned pre-compaction snapshot still collects — its files are
    # tombstoned, not deleted
    assert pinned.count() == n_expected
    man1 = incremental.load_manifest(stream_dirs["out"])
    assert man1["tombstones"]
    # drive a second generation: new batch, compact again with keep_last=0
    df.limit(2).coalesce(1).write.mode("append").parquet(stream_dirs["in"])
    q2 = incremental.incremental_dedup(
        spark, stream_dirs["in"], stream_dirs["out"], stream_dirs["ckpt"],
        cfg=CFG, max_files_per_trigger=1, once=True)
    q2.awaitTermination(180)
    assert incremental.compact_store(spark, stream_dirs["out"],
                                     keep_last=0) >= 1
    man2 = incremental.load_manifest(stream_dirs["out"])
    assert man2["generation"] == man1["generation"] + 1
    # generation-1 tombstones are now physically gone
    for t in man1["tombstones"]:
        assert not os.path.exists(
            os.path.join(stream_dirs["out"], t["path"])), t
    # current snapshot intact and complete
    store = incremental.read_store(spark, stream_dirs["out"])
    assert store.select("id").distinct().count() == len(rows)


def test_sliding_window_rejects_non_dividing_slide(spark, stream_dirs):
    """r5 ADVICE: the level-2 re-window containment argument in
    sliding_window_dup_stats only holds when slide divides window; Spark
    would silently return wrong per-window distinct counts for e.g.
    window='1 hour', slide='25 minutes'.  The operator must raise, like
    its DuckDB twin asserts."""
    import pytest as _pytest

    from webdedup.streaming import windows as win

    rows = corpus.corpus_rows(42, 4)
    batch = ingest.enrich_stream(
        spark.createDataFrame(rows, schema=corpus.PAGE_KIND_SCHEMA)
        .select("url", "warc_ts", "html", "text", "lang"))
    for w, s in [("1 hour", "25 minutes"), ("4 minutes", "3 minutes"),
                 ("1 hour", "0 seconds")]:
        with _pytest.raises(ValueError):
            win.sliding_window_dup_stats(batch, window=w, slide=s)
    # dividing slides (incl. multi-unit specs) still construct fine
    win.sliding_window_dup_stats(batch, window="1 hour 30 minutes",
                                 slide="30 minutes")
    with _pytest.raises(ValueError):
        win._interval_seconds("nonsense")


def test_scheme_stamp_blocks_incompatible_resume(spark, stream_dirs):
    """r5 ADVICE: a work_dir written under a different signature scheme
    (e.g. the pre-r5 31-bit MinHash coefficients) must REFUSE to resume —
    stored signatures would silently never match fresh ones otherwise."""
    import json
    import os

    from webdedup.streaming import incremental

    rows = corpus.corpus_rows(42, 6)
    spark.createDataFrame(rows, schema=corpus.PAGE_KIND_SCHEMA) \
        .select("url", "warc_ts", "html", "text", "lang") \
        .coalesce(1).write.mode("overwrite").parquet(stream_dirs["in"])
    q = incremental.incremental_dedup(
        spark, stream_dirs["in"], stream_dirs["out"], stream_dirs["ckpt"],
        max_files_per_trigger=8)
    q.awaitTermination(120)

    stamp = os.path.join(stream_dirs["out"], incremental.SCHEME_STAMP)
    assert os.path.isfile(stamp), "first run must write the scheme stamp"
    with open(stamp) as f:
        orig = json.load(f)

    # same scheme resumes fine (no stream start needed — the check runs
    # before the stream is constructed)
    incremental.check_scheme_stamp(stream_dirs["out"])

    # tampered version (simulating a pre-r5 store) must refuse
    with open(stamp, "w") as f:
        json.dump({**orig, "sig_scheme_version": 1}, f)
    with pytest.raises(RuntimeError, match="different signature scheme"):
        incremental.incremental_dedup(
            spark, stream_dirs["in"], stream_dirs["out"],
            stream_dirs["ckpt"], max_files_per_trigger=8)

    # unstamped pre-versioning store must also refuse
    os.remove(stamp)
    with pytest.raises(RuntimeError, match="predates scheme versioning"):
        incremental.check_scheme_stamp(stream_dirs["out"])
