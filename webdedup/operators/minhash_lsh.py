"""MinHash signatures + banded LSH + exact-Jaccard verification.

Reference semantics: ``datasketch.MinHash(num_perm=128)`` +
``MinHashLSH(threshold=0.3)`` (``minhash_search.py:12-40``), candidates from
``lsh.query`` (banding), re-ranked by signature Jaccard (``:81-83``).

Graft shape (SURVEY §2.3 J4): 128-perm signature column from an Arrow UDF,
``posexplode`` into b=32 bands x r=4 rows, band-hash equi-join for
candidates, then *exact* shingle-set Jaccard as the verify step (stronger
than the reference's signature-estimate re-rank).  The banded probability of
catching a pair with Jaccard J is 1-(1-J^r)^b: ~0.974 at J=0.3,
1 - 5e-8 at J=0.8 — so at the fixture similarity levels recall is ~1.0
while the oracle-exact path (``webdedup.operators.jaccard``) covers the
SQL-checkable semantics.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webdedup.config import DedupConfig, DEFAULT
from webdedup.functions.signatures import minhash_col
from webdedup.operators.jaccard import jaccard_verify
from webdedup.operators.simhash_lsh import cap_buckets


def minhash_signatures(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text",
                       cfg: DedupConfig = DEFAULT) -> DataFrame:
    """(id, minhash: array<long>[128]) — one Arrow-batched UDF projection.

    Input re-expanded when under-partitioned (r7), so the per-shingle md5
    pass — this operator's floor — parallelizes even when the source scan
    arrives as 1-2 partitions; a no-op at scale (plans.partitions)."""
    from webdedup.plans.partitions import ensure_min_partitions
    df = ensure_min_partitions(df.select(id_col, text_col))
    return df.select(F.col(id_col).alias("id"),
                     minhash_col(F.col(text_col), cfg).alias("minhash"))


def minhash_bands(sigs: DataFrame, cfg: DedupConfig = DEFAULT) -> DataFrame:
    """(id, table_id, band_key) — band j is a 64-bit hash of signature rows
    [j*r, (j+1)*r).  ``xxhash64`` is fine here (Spark-internal only; the
    band hash never needs a DuckDB twin because banding is the approximate
    candidate step, not an oracle-checked value).

    (The DuckDB twin of the *banded candidates* does exist —
    ``oracle_sql._minhash_band_ctes`` expresses band membership as slice
    equality, which is what the xxhash64 key encodes.)"""
    # explode fan-out guard — see plans.partitions
    from webdedup.plans.partitions import ensure_min_partitions
    sigs = ensure_min_partitions(sigs)
    r = cfg.minhash_rows
    bands = F.array(*[
        F.struct(
            F.lit(j).alias("table_id"),
            F.xxhash64(F.slice(F.col("minhash"), j * r + 1, r)).alias("band_key"),
        )
        for j in range(cfg.minhash_bands)
    ])
    return (
        sigs.select("id", F.explode(bands).alias("tb"))
        .select("id", "tb.table_id", "tb.band_key")
    )


def minhash_candidates(bands: DataFrame) -> DataFrame:
    left = bands.select(F.col("id").alias("a"), "table_id", "band_key")
    right = bands.select(F.col("id").alias("b"), "table_id", "band_key")
    return (
        left.join(right, ["table_id", "band_key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def signature_jaccard(cands: DataFrame, sigs: DataFrame) -> DataFrame:
    """Estimated Jaccard = fraction of agreeing signature positions —
    the reference's re-rank metric (``minhash_search.py:81-83``).

    Computed by an Arrow-batched numpy kernel, not a Catalyst
    ``zip_with``/``aggregate`` fold: array HOFs evaluate INTERPRETED per
    row (no codegen), and at the r6 1M-doc scale the banding's candidate
    volume grows quadratically on low-entropy text (measured 147k pairs
    at 100k docs -> 2.07M at 400k, through millions of small buckets —
    not a hot-key problem, a collision-rate one), so the per-candidate
    fold dominated ``edges_minhash``.  The kernel computes the identical
    value (#equal positions / perms, exact in float64), so the
    ``minhash_est_jaccard`` oracle rows are unaffected."""
    sa = sigs.select(F.col("id").alias("a"), F.col("minhash").alias("sig_a"))
    sb = sigs.select(F.col("id").alias("b"), F.col("minhash").alias("sig_b"))

    @F.pandas_udf("double")
    def _est(xa: pd.Series, xb: pd.Series) -> pd.Series:
        if len(xa) == 0:
            return pd.Series([], dtype="float64")
        A = np.stack(xa.to_numpy())
        B = np.stack(xb.to_numpy())
        return pd.Series((A == B).mean(axis=1))

    return (
        cands.join(sa, "a").join(sb, "b")
        .withColumn("est_jaccard", _est(F.col("sig_a"), F.col("sig_b")))
        .select("a", "b", "est_jaccard")
    )


def minhash_edges(df: DataFrame | None, id_col: str = "doc_id",
                  text_col: str = "text", cfg: DedupConfig = DEFAULT,
                  threshold: float | None = None,
                  sigs: DataFrame | None = None,
                  sets: DataFrame | None = None,
                  skew_mode: str = "salt",
                  est_prefilter: float | None = None,
                  fast_accept: float | None = None,
                  collapse_identical: bool = False,
                  cands: DataFrame | None = None,
                  ) -> tuple[DataFrame, DataFrame]:
    """(pairs, overflow_quarantine): banded LSH candidates verified by EXACT
    shingle Jaccard >= threshold — the MinHash twin of ``simhash_edges``.

    ``skew_mode``: 'salt' (default) spreads hot bands losslessly (overflow
    frame is empty); 'cap' keeps ``cfg.max_bucket_size`` members per bucket
    and RETURNS the quarantined band rows (never silently dropped —
    north_rule: no silent caps); None disables skew handling.

    ``est_prefilter``: optional signature-estimate Jaccard cutoff applied
    BEFORE the exact exploded-shingle verify — the reference's re-rank
    metric (``minhash_search.py:81-83``) as a cheap Catalyst zip_with over
    the already-loaded signatures.  The estimator is unbiased with
    std ≈ sqrt(J(1-J)/128) ≈ 0.04, so a cutoff 3σ under the verify
    threshold (e.g. 0.35 for threshold 0.5) discards the bulk of the
    false-candidate mass without touching real pairs; the pipeline's golden
    recall gate (>= 0.99) pytest-covers the safety margin.

    ``fast_accept``: optional signature-estimate cutoff ABOVE which a
    candidate pair is accepted without the exact exploded-shingle verify —
    the stratified-verify mode for the pipeline's edge sets.  The estimator
    is unbiased with std sqrt(J(1-J)/perms) (~0.044 at J=0.5 with 128
    perms), so a cutoff 3σ above the verify threshold accepts only pairs
    whose true Jaccard is below threshold with probability <~0.1% each;
    only the uncertainty band [est_prefilter, fast_accept) pays the exact
    verify, which is where the exploded-join volume goes at scale.
    When set, the output gains an ``estimated`` boolean column: accepted
    rows carry the (unbiased, ±1/128-quantized) ESTIMATE in the ``jaccard``
    column and ``estimated=true``; verified rows carry the exact value and
    ``estimated=false`` — downstream consumers can always tell the two
    apart.  The decision is deterministic for a given corpus (seeded
    perms), so results are reproducible run-to-run.  Leave ``None``
    (default) for exact-verify semantics (no ``estimated`` column) — the
    oracle-checked ``minhash_pairs`` path never sets it.

    ``sigs``/``sets``: optional materialized signature / shingle-set tables
    (stage tables in the pipeline) — without them the whole signature UDF
    subtree is embedded in a self-join plan and executes once per join arm.

    ``cands``: optional PRECOMPUTED banded candidate frame (a, b) built over
    the RAW signature table — ``minhash_candidates(minhash_bands(sigs))``,
    the exact frame the ``minhash_est_jaccard`` query ranks (r7: the entry
    memoizes it once per session and shares it across the minhash derived
    views instead of paying the band self-join per query).  Band collisions
    are PAIRWISE — dropping a document from the band table never changes
    whether two OTHER documents collide — so restricting the precomputed
    frame to non-sentinel docs (two anti-joins against the tiny empty-doc
    id set) yields EXACTLY the pair set of banding the sentinel-filtered
    table, by construction on any corpus.  Only supported with
    ``skew_mode=None`` / ``collapse_identical=False`` (the caller that
    built the frame already chose its own skew handling).

    ``collapse_identical``: pre-collapse documents with IDENTICAL shingle
    sets into one representative before banding (VERDICT r4 #4: exact
    duplicates re-band and re-verify as full cliques today — a boilerplate
    page cloned m times costs C(m,2) verifies).  Lossless by construction:
    identical sets imply identical signatures (banding behavior preserved)
    and identical Jaccard against everything, so the rep-level pair set is
    expanded back member-by-member with the rep pair's value, and
    intra-class pairs are emitted directly with their exact Jaccard 1.0
    (in fast-accept mode: est 1.0, the same accept branch the uncollapsed
    path takes).  Class key = two independent 64-bit hashes of the sorted
    shingle array (collision odds ~2^-128·n² — far below the md5-derived
    shingle hashing the operator is already built on).  Output is
    BIT-IDENTICAL to ``collapse_identical=False`` (pytest-pinned both
    modes, including an empty-text doc pair); only the work changes.
    Unsupported with ``skew_mode='cap'`` (overflow quarantine counts are
    per-document semantics).  Empty shingle sets never pair in EITHER
    mode: they are filtered out before banding (sentinel-signature filter
    below), matching the exact-verify semantics where empty-vs-anything
    Jaccard is 0 or 0/0 -> NULL and is dropped.
    """
    t = cfg.minhash_threshold if threshold is None else threshold
    if sigs is None and sets is None and df is not None:
        # r7: neither stage table supplied — ONE fused pass computes both
        # (tokenization once, one md5 per distinct shingle serving both
        # hash widths) instead of two full tokenize+md5 passes; values are
        # bit-identical to the separate operators (signatures doc)
        from webdedup.functions.signatures import minhash_shingle_sets
        fused = minhash_shingle_sets(df, cfg, id_col, text_col)
        fused = fused.localCheckpoint(eager=False)
        sigs = fused.select("id", "minhash")
        sets = fused.select("id", "shingles")
    elif sigs is None:
        # lazy checkpoint: signature UDF would otherwise run once per join arm
        sigs = minhash_signatures(df, id_col, text_col, cfg).localCheckpoint(
            eager=False)
    # Empty-shingle-set docs carry the sentinel signature (MERSENNE61 at
    # every position — signatures.minhash_udf).  They can never survive the
    # exact verify (empty vs anything is J = 0 or 0/0 -> NULL, both dropped),
    # but in fast-accept mode two empty docs band together and would be
    # accepted at est 1.0 WITHOUT verification — while the collapsed path's
    # intra-class clique excludes them (its _nonempty filter).  Exclude them
    # from banding entirely: fixes that divergence (r5 ADVICE), makes both
    # modes match the exact-verify semantics ("two unrelated empty docs are
    # not Jaccard-1.0 dups"), and removes the empty-doc mega-bucket a real
    # crawl would otherwise salt around.  Only degenerate threshold 0.0
    # could notice (empty-vs-nonempty J=0 pairs — which banding essentially
    # never surfaces as candidates anyway).
    from webdedup.functions.hashing import MERSENNE61
    sentinel = F.element_at("minhash", 1) == F.lit(MERSENNE61)
    if cands is not None:
        if collapse_identical or skew_mode is not None:
            raise ValueError(
                "cands (a precomputed banded candidate frame) is only "
                "supported with skew_mode=None and collapse_identical="
                "False — the builder of the frame owns skew handling")
        # the frame was banded over the RAW signature table; restrict to
        # non-sentinel docs (see docstring: pairwise collisions make this
        # exactly the filtered-table pair set).  AQE turns these into
        # broadcast anti-joins at runtime when the empty-id set is small.
        empty_ids = sigs.filter(sentinel).select("id")
        cands = (cands
                 .join(empty_ids.withColumnRenamed("id", "a"), "a", "left_anti")
                 .join(empty_ids.withColumnRenamed("id", "b"), "b", "left_anti"))
    sigs = sigs.filter(~sentinel)
    if collapse_identical:
        if skew_mode == "cap":
            raise ValueError(
                "collapse_identical is lossless only for the lossless skew "
                "modes; 'cap' quarantine counts are per-document")
        return _collapsed_minhash_edges(
            df, id_col, text_col, cfg, t, sigs, sets, skew_mode,
            est_prefilter, fast_accept)
    if cands is not None:
        overflow = minhash_bands(sigs.limit(0), cfg)  # empty, bands-shaped
    else:
        bands = minhash_bands(sigs, cfg)
        overflow = bands.limit(0)
        if skew_mode == "salt":
            from webdedup.operators.simhash_lsh import salted_band_candidates
            cands = salted_band_candidates(
                bands, cfg.max_bucket_size, cfg.salt_factor)
        elif skew_mode == "cap":
            kept, overflow = cap_buckets(bands, cfg.max_bucket_size)
            cands = minhash_candidates(kept)
        elif skew_mode is None:
            cands = minhash_candidates(bands)
        else:
            raise ValueError(skew_mode)
    if est_prefilter is not None or fast_accept is not None:
        est = signature_jaccard(cands, sigs)
        if est_prefilter is not None:
            est = est.filter(F.col("est_jaccard") >= est_prefilter)
        if fast_accept is not None:
            est = est.localCheckpoint(eager=False)  # accepted + uncertain arms
            accepted = (est.filter(F.col("est_jaccard") >= fast_accept)
                        .select("a", "b",
                                F.col("est_jaccard").alias("jaccard"),
                                F.lit(True).alias("estimated")))
            uncertain = (est.filter(F.col("est_jaccard") < fast_accept)
                         .select("a", "b"))
            # the uncertainty band covers a small fraction of the corpus:
            # restrict the shingle scan to its ids (jaccard_verify doc)
            verified = jaccard_verify(uncertain, df, id_col, text_col, cfg,
                                      t, sets=sets, restrict_sets=True
                                      ).withColumn("estimated", F.lit(False))
            return verified.unionByName(accepted), overflow
        cands = est.select("a", "b")
    pairs = jaccard_verify(cands, df, id_col, text_col, cfg, t, sets=sets)
    return pairs, overflow


def _collapsed_minhash_edges(df: DataFrame | None, id_col: str,
                             text_col: str, cfg: DedupConfig, t: float,
                             sigs: DataFrame, sets: DataFrame | None,
                             skew_mode: str | None,
                             est_prefilter: float | None,
                             fast_accept: float | None,
                             ) -> tuple[DataFrame, DataFrame]:
    """``minhash_edges(collapse_identical=True)`` body — see its docstring.

    Shape: class key per doc -> min-id representative -> the ORDINARY
    rep-level pipeline (bands/salt/est/verify, recursion with the flag
    off) -> member expansion joins + the intra-class 1.0 clique.  All
    extra joins move narrow (id, rep) longs; the heavy columns (128-long
    signatures, shingle arrays) now flow for representatives only.
    """
    from pyspark.sql import Window

    from webdedup.operators.jaccard import shingle_sets

    if sets is None:
        sets = shingle_sets(df, id_col, text_col, cfg).localCheckpoint(
            eager=False)
    srt = F.array_sort("shingles")
    w_cls = Window.partitionBy("_k1", "_k2")
    members = (
        sets.select("id", F.xxhash64(srt).alias("_k1"),
                    F.xxhash64(F.lit(97), srt).alias("_k2"),
                    (F.size("shingles") > 0).alias("_nonempty"))
        .withColumn("rep", F.min("id").over(w_cls))
        .select("id", "rep", "_nonempty")
        .localCheckpoint(eager=False)  # rep filter + two expansion arms
    )
    reps_ids = members.filter(F.col("id") == F.col("rep")).select("id")
    rep_pairs, overflow = minhash_edges(
        df, id_col, text_col, cfg, t,
        sigs=sigs.join(reps_ids, "id", "left_semi"),
        sets=sets.join(reps_ids, "id", "left_semi"),
        skew_mode=skew_mode, est_prefilter=est_prefilter,
        fast_accept=fast_accept, collapse_identical=False)

    value_cols = [c for c in rep_pairs.columns if c not in ("a", "b")]
    ma = members.select(F.col("rep").alias("a"), F.col("id").alias("na"))
    mb = members.select(F.col("rep").alias("b"), F.col("id").alias("nb"))
    cross = (rep_pairs.join(ma, "a").join(mb, "b")
             .select(F.least("na", "nb").alias("a"),
                     F.greatest("na", "nb").alias("b"), *value_cols))
    mm = members.filter("_nonempty")
    intra = (mm.select(F.col("rep").alias("_r"), F.col("id").alias("a"))
             .join(mm.select(F.col("rep").alias("_r"),
                             F.col("id").alias("b")), "_r")
             .filter(F.col("a") < F.col("b"))
             .select("a", "b", F.lit(1.0).alias("jaccard")))
    if fast_accept is not None:
        # the accept branch the uncollapsed path takes at est 1.0
        intra = intra.withColumn("estimated",
                                 F.lit(float(fast_accept) <= 1.0))
    if t > 1.0 or (est_prefilter or 0.0) > 1.0:
        intra = intra.limit(0)  # nothing passes those cutoffs uncollapsed
    return cross.unionByName(intra), overflow


def minhash_pairs(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", cfg: DedupConfig = DEFAULT,
                  threshold: float | None = None,
                  sigs: DataFrame | None = None,
                  sets: DataFrame | None = None,
                  skew_mode: str | None = None,
                  est_prefilter: float | None = None,
                  collapse_identical: bool = False,
                  cands: DataFrame | None = None) -> DataFrame:
    """(a, b, jaccard) convenience wrapper over ``minhash_edges`` for the
    LOSSLESS modes only (``skew_mode`` in {None, 'salt'}).  The lossy 'cap'
    mode returns a quarantine frame that must not be discarded — call
    ``minhash_edges`` and handle it (e.g. write a ``*_bucket_overflow``
    stage table as the pipeline does for SimHash)."""
    if skew_mode == "cap":
        raise ValueError(
            "skew_mode='cap' quarantines candidates; use minhash_edges() "
            "and persist/report the returned overflow frame")
    pairs, _empty = minhash_edges(
        df, id_col, text_col, cfg, threshold, sigs=sigs, sets=sets,
        skew_mode=skew_mode, est_prefilter=est_prefilter,
        collapse_identical=collapse_identical, cands=cands)
    return pairs
