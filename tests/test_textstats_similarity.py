"""Text analysis + vector similarity + multimodal plumbing + corpus
determinism."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from webdedup.config import DEFAULT as CFG
from webdedup.operators import multimodal, similarity, textstats
from webdedup.sources import corpus


def test_token_stats_basics(spark):
    df = spark.createDataFrame([(1, "a bb CCC"), (2, ""), (3, "x x x")],
                               ["doc_id", "text"])
    got = {r["doc_id"]: r for r in textstats.token_stats(df).collect()}
    assert got[1]["n_tokens"] == 3 and got[1]["n_unique_tokens"] == 3
    assert got[1]["avg_token_len"] == 2.0
    assert got[2]["n_tokens"] == 0 and got[2]["avg_token_len"] == 0.0
    assert got[3]["n_unique_tokens"] == 1


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [(1, "the cat is on the mat and it is happy"),
         (2, "der hund und die katze ist nicht da"),
         (3, "zzz qqq www")],
        ["doc_id", "text"])
    got = {r["doc_id"]: r["pred_lang"] for r in textstats.lang_id(df).collect()}
    assert got[1] == "en" and got[2] == "de" and got[3] == "und"


def test_doc_fingerprint_whitespace_invariant(spark):
    df = spark.createDataFrame(
        [(1, "a b  c"), (2, " a B c "), (3, "a b d")], ["doc_id", "text"])
    got = {r["doc_id"]: r["fingerprint"]
           for r in textstats.doc_fingerprint(df).collect()}
    assert got[1] == got[2]
    assert got[1] != got[3]


def test_cosine_topk_self_excluded_and_ranked(spark):
    vecs = [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0])]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    got = similarity.cosine_topk(df, k=2).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
    assert sorted(by_q[1])[0] == (1, 2), "nearest to e1 is (0.9,0.1)"
    assert all(r["query_id"] != r["neighbor_id"] for r in got)


def test_vector_signature_identical_vectors_collide(spark):
    v = np.random.RandomState(1).randn(CFG.embedding_dim).tolist()
    df = spark.createDataFrame(
        [(1, v), (2, v), (3, (-np.array(v)).tolist())], ["vec_id", "embedding"])
    got = {r["vec_id"]: r["sig"]
           for r in similarity.vector_signatures(df, cfg=CFG).collect()}
    assert got[1] == got[2], "same vector -> same signature (simhash.cpp:373)"
    assert got[1] != got[3], "antipodal vector -> complement signature"


def test_multimodal_decode_plumbing(spark):
    rows = [(i, bytes([i]) * (100 + i), "image") for i in range(20)]
    rows.append((99, rows[0][1], "image"))  # exact payload dup of media 0
    df = spark.createDataFrame(rows, ["media_id", "payload", "media_type"])
    meta = multimodal.decode_media(df, type_col="media_type")
    got = meta.collect()
    assert len(got) == 21
    r0 = [r for r in got if r["media_id"] == 0][0]
    assert r0["n_bytes"] == 100 and len(r0["feature"]) == multimodal.FEATURE_DIM
    dups = multimodal.media_exact_dups(meta).collect()
    assert len(dups) == 1 and dups[0]["n_members"] == 2


def test_corpus_distributed_equals_driver(spark):
    rows = corpus.corpus_rows(CFG.seed, 25)
    ddf = corpus.corpus_df(spark, CFG.seed, 25, with_labels=True)
    a = sorted((r["url"], r["text"]) for r in rows)
    b = sorted((r["url"], r["text"]) for r in ddf.select("url", "text").collect())
    assert a == b


def test_golden_fixtures_consistent():
    pairs = corpus.golden_pairs(CFG.seed, 25)
    clusters = corpus.golden_clusters(CFG.seed, 25)
    for a, b, _ in pairs:
        assert clusters[a] == clusters[b]
