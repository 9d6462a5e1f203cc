"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)``  — flagship end-to-end dedup slice on sf0.001.
``queries()``     — one callable per implemented operator (SURVEY §2).
``oracle_sql()``  — DuckDB twins computing bit-identical results (all hashes
                    are md5-derived and floats are rounded to 6 decimals in
                    BOTH engines; see webdedup/oracle_sql.py).

Queries without an oracle entry are inherently approximate/seeded operators
(banded MinHash LSH candidates, hyperplane LSH) — the driver records
rows-only checks for those; their correctness is covered by pytest against
the brute-force oracle in webdedup/oracle.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from webdedup import oracle_sql as oracle_sql_mod
from webdedup.config import DEFAULT as CFG
from webdedup.operators import (
    exact, jaccard, minhash_lsh, simhash_lsh, substring, textstats, similarity,
)
from webdedup.operators.components import connected_components
from webdedup.operators.represent import representatives
from webdedup.sources import tables


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tables.documents(spark, sf_dir)


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tables.embeddings(spark, sf_dir)


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full dedup slice on sf0.001 — SimHash-LSH pairs (exact
    Hamming<=5 semantics) + exact dups, clustered by distributed CC, with a
    representative chosen per cluster."""
    docs = _docs(spark, "/root/testdata/sf0.001")
    e1 = exact.exact_dup_edges(docs).select(
        F.col("src").alias("u"), F.col("dst").alias("v"))
    sim = simhash_lsh.simhash_pairs(docs, cfg=CFG).select(
        F.col("a").alias("u"), F.col("b").alias("v"))
    assign = connected_components(
        e1.unionByName(sim), nodes=docs.select("doc_id"), cfg=CFG)
    return representatives(assign, docs.withColumn("n_chars", F.length("text")),
                           id_col="doc_id", score_col="n_chars")


# ---------------------------------------------------------------------------
# queries + oracles
# ---------------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # --- exact dedup (SURVEY A1/S3) ---
    q["exact_dup_groups"] = lambda s, d: exact.exact_dup_groups(_docs(s, d))
    q["content_hashes"] = lambda s, d: exact.with_content_hash(
        _docs(s, d)).select("doc_id", "content_sha")

    # --- text analysis ---
    q["token_stats"] = lambda s, d: textstats.token_stats(_docs(s, d))
    q["quality_scores"] = lambda s, d: textstats.quality_scores(_docs(s, d))
    q["lang_id"] = lambda s, d: textstats.lang_id(_docs(s, d))
    q["doc_fingerprint"] = lambda s, d: textstats.doc_fingerprint(_docs(s, d))

    # --- simhash (SURVEY P6/P9/J1/J2) ---
    q["simhash64"] = lambda s, d: simhash_lsh.simhash_fingerprints(
        _docs(s, d)).select(F.col("id").alias("doc_id"), "simhash")
    q["simhash_pairs"] = lambda s, d: simhash_lsh.simhash_pairs(
        _docs(s, d), cfg=CFG)
    q["simhash_pairs_combo"] = lambda s, d: simhash_lsh.simhash_pairs(
        _docs(s, d), cfg=CFG, scheme="combo")

    # --- shingles / jaccard (SURVEY P8/P11/J4/J6) ---
    q["shingle_stats"] = lambda s, d: jaccard.shingle_sets(
        _docs(s, d), cfg=CFG).select(
            F.col("id").alias("doc_id"),
            F.size("shingles").alias("n_shingles"))
    q["jaccard_pairs"] = lambda s, d: jaccard.jaccard_all_pairs(
        _docs(s, d), cfg=CFG, threshold=CFG.jaccard_threshold).withColumn(
            "jaccard", F.round("jaccard", 6))
    q["minhash_sig"] = lambda s, d: minhash_lsh.minhash_signatures(
        _docs(s, d), cfg=CFG).select(
            F.col("id").alias("doc_id"),
            F.posexplode("minhash").alias("perm_id", "sig_value"))
    # approximate (banded LSH) candidates -> exact-verified pairs; no SQL
    # oracle (banding is probabilistic) — rows-only check + pytest coverage
    q["minhash_lsh_pairs"] = lambda s, d: minhash_lsh.minhash_pairs(
        _docs(s, d), cfg=CFG, threshold=CFG.jaccard_threshold).withColumn(
            "jaccard", F.round("jaccard", 6))

    # --- substring / suffix pass ---
    q["substring_pairs"] = lambda s, d: substring.substring_pairs(
        _docs(s, d), cfg=CFG)

    # --- clustering + representatives (SURVEY C1/W1) ---
    def _assignments(s: SparkSession, d: str) -> DataFrame:
        docs = _docs(s, d)
        e1 = exact.exact_dup_edges(docs).select(
            F.col("src").alias("u"), F.col("dst").alias("v"))
        sim = simhash_lsh.simhash_pairs(docs, cfg=CFG).select(
            F.col("a").alias("u"), F.col("b").alias("v"))
        jac = jaccard.jaccard_all_pairs(
            docs, cfg=CFG, threshold=CFG.jaccard_threshold).select(
            F.col("a").alias("u"), F.col("b").alias("v"))
        return connected_components(
            e1.unionByName(sim).unionByName(jac),
            nodes=docs.select("doc_id"), cfg=CFG,
        ).select(F.col("id").alias("doc_id"), "cluster_id")

    q["cluster_assignments"] = _assignments

    def _reps(s: SparkSession, d: str) -> DataFrame:
        docs = _docs(s, d)
        assign = _assignments(s, d).select(
            F.col("doc_id").alias("id"), "cluster_id")
        return representatives(
            assign, docs.select("doc_id", "n_chars"),
            id_col="doc_id", score_col="n_chars")

    q["representatives"] = _reps

    # --- regex label projection (SURVEY P2) + L2 norm (P4) ---
    q["source_labels"] = lambda s, d: _docs(s, d).select(
        "doc_id",
        F.when(F.regexp_extract("source", r"src(\d+)", 1) != "",
               F.regexp_extract("source", r"src(\d+)", 1))
        .otherwise(F.lit("unknown")).alias("label"))

    def _emb_norms(s: SparkSession, d: str) -> DataFrame:
        from webdedup.operators.similarity import with_norm
        return (with_norm(_emb(s, d), "embedding", "l2_norm")
                .select("vec_id", F.round("l2_norm", 6).alias("l2_norm")))

    q["embedding_norms"] = _emb_norms

    # --- LSH index stats + median heuristic (SURVEY A6/A8) ---
    def _band_stats(s: SparkSession, d: str) -> DataFrame:
        sigs = simhash_lsh.simhash_fingerprints(_docs(s, d))
        bands = simhash_lsh.simhash_bands(sigs, CFG, scheme="single")
        buckets = bands.groupBy("table_id", "band_key").agg(
            F.count(F.lit(1)).alias("bsz"))
        return buckets.groupBy("table_id").agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("bsz").alias("max_bucket"),
            F.sum("bsz").alias("n_rows"))

    q["simhash_band_stats"] = _band_stats

    def _median_heuristic(s: SparkSession, d: str) -> DataFrame:
        sigs = simhash_lsh.simhash_fingerprints(_docs(s, d))
        bands = simhash_lsh.simhash_bands(sigs, CFG, scheme="single")
        cands = simhash_lsh.band_candidates(bands)
        sa = sigs.select(F.col("id").alias("a"), F.col("simhash").alias("sig_a"))
        sb = sigs.select(F.col("id").alias("b"), F.col("simhash").alias("sig_b"))
        ham = (cands.join(sa, "a").join(sb, "b")
               .withColumn("hamming",
                           F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))))
        # reference auto-threshold: 0.5 * median distance
        # (run_pipeline.py:391-393)
        return ham.agg(
            F.round(F.percentile("hamming", F.lit(0.5)) * 0.5, 6)
            .alias("median_threshold"),
            F.count(F.lit(1)).alias("n_candidates"))

    q["median_candidate_hamming"] = _median_heuristic

    # --- matcher agreement (SURVEY U2/A5 intersect-except evaluation) ---
    def _agreement(s: SparkSession, d: str) -> DataFrame:
        docs = _docs(s, d)
        sp = simhash_lsh.simhash_pairs(docs, cfg=CFG).select("a", "b")
        jp = jaccard.jaccard_all_pairs(
            docs, cfg=CFG, threshold=CFG.jaccard_threshold).select("a", "b")
        tp = sp.join(jp, ["a", "b"], "left_semi").count()
        fp = sp.join(jp, ["a", "b"], "left_anti").count()
        fn = jp.join(sp, ["a", "b"], "left_anti").count()
        return s.createDataFrame([(tp, fp, fn)], "tp long, fp long, fn long")

    q["matcher_agreement"] = _agreement

    # --- predicate + agg / ranking window (SURVEY P1/W2) ---
    q["lang_stats"] = lambda s, d: (
        _docs(s, d).filter(F.col("lang").isin("en", "de"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.round(F.avg("n_chars"), 6).alias("avg_chars"),
             F.max("n_chars").alias("max_chars")))

    def _topk_lang(s: SparkSession, d: str) -> DataFrame:
        from pyspark.sql import Window
        w = Window.partitionBy("lang").orderBy(
            F.desc("n_chars"), F.asc("doc_id"))
        return (_docs(s, d)
                .withColumn("rk", F.row_number().over(w))
                .filter(F.col("rk") <= 3)
                .select("lang", "doc_id", "n_chars", "rk"))

    q["topk_per_lang"] = _topk_lang

    # --- multimodal plumbing (binary payload -> decoded metadata) ---
    def _media(s: SparkSession, d: str) -> DataFrame:
        from webdedup.operators import multimodal
        media = _docs(s, d).select(
            F.col("doc_id").alias("media_id"),
            F.encode("text", "utf-8").alias("payload"))
        meta = multimodal.decode_media(media)
        return meta.select("media_id", "n_bytes", "payload_sha")

    q["media_meta"] = _media

    # --- embedding similarity ---
    q["cosine_topk"] = lambda s, d: similarity.cosine_topk(
        _emb(s, d), k=CFG.topk)
    # threshold 0.3: the gaussian test embeddings have no pairs above ~0.48,
    # so the config default (0.9) would make this check vacuous
    q["cosine_dup_pairs"] = lambda s, d: similarity.cosine_pairs(
        _emb(s, d), threshold=0.3)
    # seeded hyperplane LSH — no SQL oracle (driver rows-only check)
    q["vector_signatures"] = lambda s, d: similarity.vector_signatures(
        _emb(s, d), cfg=CFG)
    q["lsh_cosine_pairs"] = lambda s, d: similarity.lsh_cosine_pairs(
        _emb(s, d), threshold=0.3, cfg=CFG)

    return q


def oracle_sql() -> dict[str, str]:
    return {
        "exact_dup_groups": oracle_sql_mod.exact_dup_groups(),
        "content_hashes": oracle_sql_mod.content_hashes(),
        "token_stats": oracle_sql_mod.token_stats(),
        "quality_scores": oracle_sql_mod.quality_scores(),
        "lang_id": oracle_sql_mod.lang_id(),
        "doc_fingerprint": oracle_sql_mod.doc_fingerprint(),
        "simhash64": oracle_sql_mod.simhash64(),
        "simhash_pairs": oracle_sql_mod.simhash_pairs(CFG.hamming_threshold),
        "simhash_pairs_combo": oracle_sql_mod.simhash_pairs(CFG.hamming_threshold),
        "shingle_stats": oracle_sql_mod.shingle_stats(CFG.shingle_k),
        "jaccard_pairs": oracle_sql_mod.jaccard_pairs(
            CFG.shingle_k, CFG.jaccard_threshold),
        "minhash_sig": oracle_sql_mod.minhash_sig_long(CFG),
        "substring_pairs": oracle_sql_mod.substring_pairs(CFG),
        "cluster_assignments": oracle_sql_mod.cluster_assignments(CFG),
        "representatives": oracle_sql_mod.representatives(CFG),
        "source_labels": oracle_sql_mod.source_labels(),
        "embedding_norms": oracle_sql_mod.embedding_norms(),
        "simhash_band_stats": oracle_sql_mod.simhash_band_stats(),
        "median_candidate_hamming": oracle_sql_mod.median_candidate_hamming(),
        "matcher_agreement": oracle_sql_mod.matcher_agreement(
            CFG.shingle_k, CFG.hamming_threshold, CFG.jaccard_threshold),
        "lang_stats": oracle_sql_mod.lang_stats(),
        "topk_per_lang": oracle_sql_mod.topk_per_lang(3),
        "media_meta": oracle_sql_mod.media_meta(),
        "cosine_topk": oracle_sql_mod.cosine_topk(CFG.topk),
        "cosine_dup_pairs": oracle_sql_mod.cosine_pairs(0.3),
    }

