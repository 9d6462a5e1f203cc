"""Text-analysis operators for a training-data pipeline: token counting,
quality scoring, language ID, document fingerprinting.

These extend the reference's capability surface in the direction a 100 TB
webtext pipeline needs (the reference's analogs are its image-quality
heuristics: sharpness/resolution scoring ``image_utils.py:10-19`` and
filename-label extraction ``ground_truth_utils.py:15-21``).

Everything here is pure Catalyst column expressions (JVM-side, codegen) —
zero UDFs — and each operator has an exact DuckDB twin in
``__spark_entry__.oracle_sql``.  Floating outputs are rounded so the
cross-engine value-hash comparison is stable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from webdedup.functions.hashing import h60_col
from webdedup.functions.tokenize import tokens_col

# Tiny deterministic marker-word lists for the n-gram/stopword language
# heuristic.  Deliberately small + hard-coded: the SAME lists are inlined in
# the oracle SQL, and a real pipeline would swap in fastText — this operator
# is about the Spark shape (array intersection scoring), not lexicography.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "of", "and", "to", "in", "is", "you", "that", "it", "for"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "für", "auf"),
    "fr": ("le", "la", "les", "et", "des", "est", "pour", "dans", "une", "que"),
    "es": ("el", "la", "los", "las", "es", "por", "para", "con", "una", "del"),
    "vi": ("của", "và", "các", "là", "trong", "cho", "được", "với", "người", "không"),
}

STOPWORDS = LANG_MARKERS["en"]


def _txt(text_col: str) -> Column:
    """NULL-safe text: NULL behaves as '' (zero counts / ratios) in every
    operator here, matching the signature UDFs' ``text or ""`` and the
    coalesced DuckDB twins.  Without this, ``F.size(F.split(NULL))`` is -1
    under non-ANSI semantics while DuckDB returns NULL — engine-dependent
    nonsense on any nullable text column (ADVICE r3)."""
    return F.coalesce(F.col(text_col), F.lit(""))


def token_stats(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_unique_tokens, avg_token_len) — whitespace +
    lowercase token accounting (SURVEY §2.4 A2 as a standalone operator)."""
    toks = tokens_col(_txt(text_col))
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
        F.round(
            F.when(
                F.size(toks) > 0,
                F.aggregate(toks, F.lit(0).cast("long"),
                            lambda acc, t: acc + F.length(t)).cast("double")
                / F.size(toks),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("avg_token_len"),
    )


def quality_scores(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """(doc_id, n_chars, n_tokens, stopword_ratio, punct_ratio, uniq_ratio,
    quality) — cheap heuristic quality signals (Gopher/C4-style filters)."""
    toks = tokens_col(_txt(text_col))
    n_tok = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_chars = F.length(_txt(text_col))
    n_punct = n_chars - F.length(F.regexp_replace(_txt(text_col), r"[^\w\s]", ""))
    uniq = F.size(F.array_distinct(toks))
    stop_ratio = F.when(n_tok > 0, n_stop.cast("double") / n_tok).otherwise(0.0)
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(0.0)
    uniq_ratio = F.when(n_tok > 0, uniq.cast("double") / n_tok).otherwise(0.0)
    quality = (
        F.least(n_tok.cast("double") / F.lit(100.0), F.lit(1.0)) * 0.4
        + F.least(stop_ratio * F.lit(5.0), F.lit(1.0)) * 0.3
        + uniq_ratio * 0.3
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_chars.alias("n_chars"),
        n_tok.alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(uniq_ratio, 6).alias("uniq_ratio"),
        F.round(quality, 6).alias("quality"),
    )


def lang_id(df: DataFrame, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """(doc_id, pred_lang, lang_score) — argmax of marker-word hit counts,
    ties broken by language code; 'und' when nothing matches."""
    toks = tokens_col(_txt(text_col))
    scores = []
    for lang in sorted(LANG_MARKERS):
        markers = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))
        scores.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    # array_max over structs: max by hits, then (desc) lang — to get
    # deterministic asc-lang tie-break, compare on (hits, negated lang) is
    # awkward in SQL; instead sort desc by hits, asc by lang via sort_array
    arr = F.array(*scores)
    best = F.sort_array(arr, asc=False)  # struct order: hits desc then lang desc
    # to break ties by *ascending* lang we re-sort equal-hit heads:
    top_hits = best[0]["hits"]
    winners = F.filter(arr, lambda s: s["hits"] == top_hits)
    pred = F.array_min(F.transform(winners, lambda s: s["lang"]))
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.when(top_hits > 0, pred).otherwise(F.lit("und")).alias("pred_lang"),
        top_hits.cast("long").alias("lang_score"),
    )


def doc_fingerprint(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """(doc_id, fingerprint) — 60-bit content fingerprint of the normalized
    token stream (md5-derived; stable across engines and whitespace noise)."""
    normalized = F.concat_ws(" ", tokens_col(_txt(text_col)))
    return df.select(
        F.col(id_col).alias("doc_id"),
        h60_col(normalized).alias("fingerprint"),
    )


# BPE-ish piece pattern: letter runs | single digits | any other non-space
# char.  Explicit whitespace class on purpose: Java's \s includes \x0B where
# RE2's (DuckDB's) does not, and the twin must match byte-for-byte.
SUBTOKEN_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9 \t\n\r\f]"


def subtoken_stats(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """(doc_id, n_pieces, n_unique_pieces, avg_piece_len, fertility) —
    BPE-ish regex-piece accounting: letter runs, single digits, and isolated
    symbol characters, the shape of a byte-pair pre-tokenizer's coarse
    splits.  ``fertility`` = pieces per whitespace token, the standard
    tokenizer-cost metric a training-data pipeline budgets by.  Pure
    Catalyst (``regexp_extract_all`` is JVM-side); exact DuckDB twin."""
    pieces = F.regexp_extract_all(_txt(text_col), F.lit(SUBTOKEN_PATTERN), 0)
    toks = tokens_col(_txt(text_col))
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(pieces).alias("n_pieces"),
        F.size(F.array_distinct(pieces)).alias("n_unique_pieces"),
        F.round(
            F.when(
                F.size(pieces) > 0,
                F.aggregate(pieces, F.lit(0).cast("long"),
                            lambda acc, t: acc + F.length(t)).cast("double")
                / F.size(pieces),
            ).otherwise(F.lit(0.0)), 6).alias("avg_piece_len"),
        F.round(
            F.when(F.size(toks) > 0,
                   F.size(pieces).cast("double") / F.size(toks))
            .otherwise(F.lit(0.0)), 6).alias("fertility"),
    )
