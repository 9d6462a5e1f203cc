"""Exact-substring duplicate pass (the suffix-array analog, SURVEY §7 step 8).

Goal: find pairs of documents sharing a long verbatim token run (the
north_rule's "suffix-array pass for exact substring duplicates").  A true
distributed suffix array over 10^12 docs is unnecessary for the pair-finding
semantics; the scalable equivalent is **content-defined anchor sampling**
(winnowing-style, Schleimer et al. SIGMOD'03 / MOSS):

1. every token position i yields the k-gram fingerprint
   ``h60(tokens[i..i+K))`` (K = ``anchor_tokens``);
2. keep fingerprints with ``h % anchor_mod == 0`` — selection depends only on
   the *content* of the k-gram, so a verbatim run shared by two docs is
   sampled at identical offsets within the run regardless of where it sits
   in each doc (position-independence is what makes this a substring
   detector rather than a whole-doc one);
3. pairs sharing >= ``min_anchors`` sampled fingerprints are emitted with the
   shared-anchor count (expected one anchor per ``anchor_mod`` positions, so
   ``n_shared >= 2`` evidences a run of ~>= 2*mod+K tokens).

Everything is native Catalyst (sequence/transform/slice + md5 hashing +
equi-join) — no UDF — and DuckDB-expressible, so this operator is
oracle-checked exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

import pandas as pd
from pyspark.sql.types import ArrayType, LongType

from webdedup.config import DedupConfig, DEFAULT
from webdedup.functions.hashing import h60_py
from webdedup.functions.tokenize import shingles_py, tokenize_py
from webdedup.functions.hashing import h60_col
from webdedup.functions.tokenize import shingles_col, tokens_col


def anchor_index(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text",
                 cfg: DedupConfig = DEFAULT,
                 use_udf: bool = True) -> DataFrame:
    """(id, anchor) — distinct sampled k-gram fingerprints per doc.

    UDF and Catalyst implementations produce bit-identical anchors (both
    md5-derived); the UDF is the fast path (see jaccard.shingle_sets)."""
    if not use_udf:
        grams = shingles_col(tokens_col(F.col(text_col)), cfg.anchor_tokens)
        hashes = F.transform(grams, h60_col)
        sampled = F.array_distinct(
            F.filter(hashes, lambda h: h % cfg.anchor_mod == 0)
        )
        return (
            df.select(F.col(id_col).alias("id"), sampled.alias("anchors"))
            .select("id", F.explode("anchors").alias("anchor"))
        )

    from webdedup.functions.registry import get_tokenizer
    from webdedup.plans.partitions import ensure_min_partitions

    # the per-16-gram md5 pass is this operator's floor; a small parquet
    # scan arrives as 1-2 partitions and would run it on 1-2 cores (r7;
    # no-op at scale — see plans.partitions)
    df = ensure_min_partitions(df.select(id_col, text_col))
    K, mod = cfg.anchor_tokens, cfg.anchor_mod
    tok = get_tokenizer(cfg.tokenizer)

    @F.pandas_udf(ArrayType(LongType()))
    def _udf(texts: pd.Series) -> pd.Series:
        def anchors(text: str) -> list[int]:
            seen: dict[int, None] = {}
            for g in shingles_py(tok(text or ""), K):
                h = h60_py(g)
                if h % mod == 0:
                    seen[h] = None
            return list(seen)

        return texts.map(anchors)

    return (
        df.select(F.col(id_col).alias("id"),
                  _udf(F.col(text_col)).alias("anchors"))
        .select("id", F.explode("anchors").alias("anchor"))
    )


def substring_pairs(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", cfg: DedupConfig = DEFAULT,
                    min_anchors: int = 2,
                    max_df: int | None = None) -> DataFrame:
    """(a, b, n_shared) — pairs sharing >= min_anchors sampled fingerprints.

    ``max_df`` drops anchors appearing in more than that many docs
    (boilerplate runs) before the self-join — the scale path; the oracle
    query runs uncapped.
    """
    return substring_pairs_from_index(
        anchor_index(df, id_col, text_col, cfg).localCheckpoint(eager=False),
        min_anchors, max_df)


def substring_pairs_from_index(idx: DataFrame, min_anchors: int = 2,
                               max_df: int | None = None) -> DataFrame:
    """Pair join over a (materialized) anchor index — pipeline stage form."""
    if max_df is not None:
        from pyspark.sql import Window
        n_part = int(idx.sparkSession.conf.get(
            "spark.sql.shuffle.partitions", "32"))
        w = Window.partitionBy("anchor")
        idx = (idx.repartition(n_part, "anchor")  # see cap_buckets note
               .withColumn("_df", F.count(F.lit(1)).over(w))
               .filter(F.col("_df") <= max_df).drop("_df"))
    return (
        idx.select(F.col("id").alias("a"), "anchor")
        .join(idx.select(F.col("id").alias("b"), "anchor"), "anchor")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_anchors)
    )
