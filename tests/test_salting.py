"""Salted hot-bucket candidate generation must be EXACTLY lossless."""

from __future__ import annotations

from pyspark.sql import functions as F

from webdedup.config import DEFAULT as CFG
from webdedup.operators import simhash_lsh


def _pairs(df):
    return {(r["a"], r["b"]) for r in df.collect()}


def test_salted_equals_unsalted_with_hot_bucket(spark):
    # one giant bucket (60 ids in table 0 / key 7), several cold buckets
    rows = [(i, 0, 7) for i in range(60)]
    rows += [(100 + i, 1, i % 5) for i in range(20)]
    bands = spark.createDataFrame(rows, ["id", "table_id", "band_key"])
    exact = _pairs(simhash_lsh.band_candidates(bands))
    for hot_threshold in (5, 30, 1000):
        salted = _pairs(simhash_lsh.salted_band_candidates(
            bands, hot_threshold, salt_factor=4))
        assert salted == exact, f"hot_threshold={hot_threshold}"


def test_simhash_edges_salt_mode_components(docs, corpus_texts):
    """salt-mode edges yield the same components as brute-force simhash."""
    from webdedup import oracle
    e_salt, overflow = simhash_lsh.simhash_edges(
        docs, cfg=CFG, scheme="combo", skew_mode="salt")
    assert overflow.count() == 0
    clone_plus_rep = {(r["a"], r["b"]) for r in e_salt.collect()}
    exp = oracle.simhash_pairs(corpus_texts, CFG)
    ids = sorted(corpus_texts)
    got_comp = oracle.union_find_clusters(ids, clone_plus_rep)
    exp_comp = oracle.union_find_clusters(ids, exp)
    assert got_comp == exp_comp
