"""Each distributed matcher must equal its local brute-force oracle exactly
(band-LSH recall-1.0 guarantees) or within its designed probability
(MinHash banding), on the fixture corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from webdedup import oracle
from webdedup.config import DEFAULT as CFG
from webdedup.operators import exact, jaccard, minhash_lsh, simhash_lsh, substring


def _pairset(df, a="a", b="b"):
    return {(r[a], r[b]) for r in df.select(a, b).collect()}


def test_exact_edges_match_oracle(docs, corpus_texts):
    got = _pairset(exact.exact_dup_edges(docs), "src", "dst")
    exp = oracle.exact_pairs(corpus_texts)
    # star edges connect min->member; as sets of connected pairs they are a
    # subset of the clique, but cover the same components
    comp = oracle.union_find_clusters(sorted(corpus_texts), exp)
    got_comp = oracle.union_find_clusters(sorted(corpus_texts), got)
    assert got_comp == comp


def test_simhash_single_scheme_equals_bruteforce(docs, corpus_texts):
    got = _pairset(simhash_lsh.simhash_pairs(docs, cfg=CFG, scheme="single"))
    exp = oracle.simhash_pairs(corpus_texts, CFG)
    assert got == exp, (len(got), len(exp))


def test_simhash_combo_scheme_equals_bruteforce(docs, corpus_texts):
    got = _pairset(simhash_lsh.simhash_pairs(docs, cfg=CFG, scheme="combo"))
    exp = oracle.simhash_pairs(corpus_texts, CFG)
    assert got == exp


def test_jaccard_all_pairs_equals_bruteforce(docs, corpus_texts):
    got = _pairset(jaccard.jaccard_all_pairs(
        docs, cfg=CFG, threshold=CFG.jaccard_threshold))
    exp = oracle.jaccard_pairs(corpus_texts, CFG.jaccard_threshold, CFG)
    assert got == exp


def test_minhash_banding_recall(docs, corpus_texts):
    got = _pairset(minhash_lsh.minhash_pairs(
        docs, cfg=CFG, threshold=CFG.jaccard_threshold))
    exp = oracle.jaccard_pairs(corpus_texts, CFG.jaccard_threshold, CFG)
    assert got <= exp, "verify step must keep only true >=threshold pairs"
    # overall recall: 32x4 banding at J~0.5 misses ~13% by design (the
    # reference's own datasketch config); the pipeline's union of matchers
    # covers those.  Gate hard where banding is designed to be reliable:
    recall_all = len(got & exp) / len(exp) if exp else 1.0
    assert recall_all >= 0.90, f"minhash overall recall {recall_all:.3f}"
    high = oracle.jaccard_pairs(corpus_texts, 0.7, CFG)
    recall_high = len(got & high) / len(high) if high else 1.0
    assert recall_high >= 0.99, f"minhash recall@J>=0.7 {recall_high:.3f}"


def test_substring_pairs_equal_bruteforce(docs, corpus_texts):
    got = _pairset(substring.substring_pairs(docs, cfg=CFG))
    exp = oracle.substring_pairs(corpus_texts, CFG)
    assert got == exp


def test_substring_variant_detected(docs, pages):
    """Every present substring-kind page must pair with its base."""
    subs = {r["url"]: r["group_id"] for r in
            pages.filter(F.col("kind") == "substring").collect()}
    got = _pairset(substring.substring_pairs(docs, cfg=CFG))
    linked = {a for a, _ in got} | {b for _, b in got}
    missing = [u for u in subs if u not in linked]
    assert not missing, f"substring variants not linked: {missing[:5]}"


def test_minhash_signature_properties(spark):
    from webdedup.operators.minhash_lsh import minhash_signatures, signature_jaccard
    df = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, "a b c d e f g h i j"),
         (3, "totally different words here now")],
        ["doc_id", "text"])
    sigs = minhash_signatures(df, cfg=CFG)
    rows = {r["id"]: r["minhash"] for r in sigs.collect()}
    assert rows[1] == rows[2], "identical text -> identical signature"
    assert rows[1] != rows[3]
    cands = spark.createDataFrame([(1, 2), (1, 3)], ["a", "b"])
    est = {(r["a"], r["b"]): r["est_jaccard"]
           for r in signature_jaccard(cands, sigs).collect()}
    assert est[(1, 2)] == 1.0
    assert est[(1, 3)] < 0.2


def test_lsh_cosine_recall_sweep(spark):
    """The ANN recall/cost dial (faiss nprobe analog): multi-probe raises
    recall vs the exact cosine oracle; verify keeps only true pairs."""
    from webdedup.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    exact_pairs = _pairset(similarity.cosine_pairs(emb, threshold=0.3))
    assert exact_pairs, "fixture must have >=1 pair above threshold"
    recalls = {}
    for probe in (0, 1, 2):
        got = _pairset(similarity.lsh_cosine_pairs(
            emb, threshold=0.3, cfg=CFG, probe_bits=probe))
        assert got <= exact_pairs, "cosine verify admits only true pairs"
        recalls[probe] = len(got) / len(exact_pairs)
    assert recalls[0] < recalls[1] < recalls[2], \
        f"multi-probe must raise recall {recalls}"
    assert recalls[2] >= 0.90, f"probe_bits=2 recall {recalls[2]:.3f}"
    # at the production threshold (0.9) even probe 0 is designed for ~0.87
    # recall at 3% random-pair mass; the 0.3-threshold regime here is the
    # ρ-bound stress case (PLANS.md §11)


def test_lsh_cosine_blocked_equals_fold(spark):
    """The per-bucket-matmul verify and the candidate-join Catalyst-fold
    verify are two physical plans for the SAME operator — identical output
    (pairs AND rounded cosines) at every probe level."""
    from webdedup.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    for probe in (0, 2):
        blocked = {(r["a"], r["b"]): r["cosine"] for r in
                   similarity.lsh_cosine_pairs(
                       emb, threshold=0.3, cfg=CFG, probe_bits=probe,
                       verify="blocked").collect()}
        fold = {(r["a"], r["b"]): r["cosine"] for r in
                similarity.lsh_cosine_pairs(
                    emb, threshold=0.3, cfg=CFG, probe_bits=probe,
                    verify="fold").collect()}
        assert blocked == fold, (probe, len(blocked), len(fold))


def test_lsh_cosine_hot_bucket_grid_split(spark):
    """Lossless grid split (ADVICE r3 skew hazard): forcing EVERY bucket
    through the ns x ns sub-task grid (max_bucket_rows far below real
    bucket sizes) must not change a single pair or cosine — only the task
    granularity changes."""
    from webdedup.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    base = {(r["a"], r["b"]): r["cosine"] for r in
            similarity.lsh_cosine_pairs(emb, threshold=0.3, cfg=CFG).collect()}
    split = {(r["a"], r["b"]): r["cosine"] for r in
             similarity.lsh_cosine_pairs(
                 emb, threshold=0.3, cfg=CFG, max_bucket_rows=8).collect()}
    assert base and split == base, (len(base), len(split))


def test_lsh_cosine_zero_norm_and_threshold_contract(spark):
    """Zero-norm vectors are excluded up front (cosine undefined; numpy and
    Catalyst disagree on NaN comparisons otherwise) and thresholds <= 0 are
    rejected — the documented input contract (ADVICE r3)."""
    import pytest
    from pyspark.sql import functions as F
    from webdedup.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    dim = len(emb.select("embedding").first()["embedding"])
    zero = spark.createDataFrame(
        [(999_999_999, [0.0] * dim, 0)], "vec_id long, embedding array<float>, label int"
    ).withColumn("embedding", F.col("embedding").cast("array<float>"))
    aug = emb.unionByName(zero)
    blocked = {(r["a"], r["b"]): r["cosine"] for r in
               similarity.lsh_cosine_pairs(aug, threshold=0.3, cfg=CFG).collect()}
    fold = {(r["a"], r["b"]): r["cosine"] for r in
            similarity.lsh_cosine_pairs(
                aug, threshold=0.3, cfg=CFG, verify="fold").collect()}
    assert blocked == fold
    ids = {i for p in blocked for i in p}
    assert 999_999_999 not in ids, "zero-norm vector leaked into pair output"
    assert not any(c != c for c in blocked.values()), "NaN cosine emitted"
    with pytest.raises(ValueError, match="threshold > 0"):
        similarity.lsh_cosine_pairs(emb, threshold=0.0, cfg=CFG)


def test_minhash_est_prefilter_keeps_recall(docs, corpus_texts):
    """Signature-estimate prefilter (minhash_search.py:81-83) 3σ under the
    verify threshold must not change what survives the exact verify where
    banding is reliable (J>=0.7)."""
    got = _pairset(minhash_lsh.minhash_pairs(
        docs, cfg=CFG, threshold=CFG.jaccard_threshold, est_prefilter=0.35))
    exp = oracle.jaccard_pairs(corpus_texts, CFG.jaccard_threshold, CFG)
    assert got <= exp
    high = oracle.jaccard_pairs(corpus_texts, 0.7, CFG)
    recall_high = len(got & high) / len(high) if high else 1.0
    assert recall_high >= 0.99, f"est-prefilter recall@J>=0.7 {recall_high:.3f}"


def test_minhash_fast_accept_stratification(docs, corpus_texts):
    """fast_accept must only ADD pairs (est >= cutoff, skipping the exact
    verify) relative to the exact-verify edge set — never lose one."""
    kw = dict(cfg=CFG, threshold=CFG.jaccard_threshold, skew_mode="salt",
              est_prefilter=0.37)
    base, _ = minhash_lsh.minhash_edges(docs, **kw)
    fast, _ = minhash_lsh.minhash_edges(docs, fast_accept=0.633, **kw)
    # exact mode has no flag column; fast-accept mode marks every row so
    # consumers can tell estimate-valued scores from exact ones (ADVICE r3)
    assert "estimated" not in base.columns
    assert "estimated" in fast.columns
    bs, fs = _pairset(base), _pairset(fast)
    assert bs <= fs, "stratified verify lost exact-verified pairs"
    flagged = {(r["a"], r["b"]) for r in
               fast.filter("estimated").select("a", "b").collect()}
    assert flagged >= (fs - bs), "un-flagged estimate row escaped"
    if fs - bs:
        from pyspark.sql import functions as F
        sigs = minhash_lsh.minhash_signatures(docs, cfg=CFG)
        extra = docs.sparkSession.createDataFrame(
            sorted(fs - bs), "a string, b string")
        est = minhash_lsh.signature_jaccard(extra, sigs)
        low = est.filter(F.col("est_jaccard") < 0.633).count()
        assert low == 0, "fast-accepted pair below the acceptance cutoff"


def test_jaccard_max_df_cap_equivalent_here(docs, corpus_texts):
    """df-capped candidate generation + full-set verify: identical results
    on data whose max shingle df is far below the cap (values are exact by
    construction; only recall could differ, and here it does not)."""
    capped = _pairset(jaccard.jaccard_all_pairs(
        docs, cfg=CFG, threshold=CFG.jaccard_threshold,
        max_df=CFG.max_bucket_size))
    exp = oracle.jaccard_pairs(corpus_texts, CFG.jaccard_threshold, CFG)
    assert capped == exp


def test_ivf_cosine_recall(spark):
    """IVF (second ANN index type): verify admits only true pairs; nprobe
    raises recall; nprobe=k_centroids degenerates to (clustered) full
    coverage of every pair sharing any probe list."""
    from webdedup.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    exact_pairs = _pairset(similarity.cosine_pairs(emb, threshold=0.3))
    recalls = {}
    for nprobe in (1, 2, 4):
        got = _pairset(similarity.ivf_cosine_pairs(
            emb, threshold=0.3, k_centroids=16, nprobe=nprobe))
        assert got <= exact_pairs
        recalls[nprobe] = len(got) / len(exact_pairs)
    assert recalls[1] <= recalls[2] <= recalls[4], recalls
    assert recalls[4] >= recalls[1]
    # with nprobe == k_centroids every vector probes every list -> the
    # candidate set is ALL pairs and recall must be exactly 1.0
    full = _pairset(similarity.ivf_cosine_pairs(
        emb, threshold=0.3, k_centroids=8, nprobe=8))
    assert full == exact_pairs


def test_jaccard_verify_restrict_sets_equivalence(spark):
    """restrict_sets=True/False must be result-identical (the flag is a
    physical-plan choice: restricted single-scan vs corpus-wide sizes)."""
    from webdedup.sources import corpus

    docs = spark.createDataFrame(corpus.corpus_rows(CFG.seed + 7, 40),
                                 schema=corpus.PAGE_KIND_SCHEMA)
    docs = docs.select(F.xxhash64("url").alias("doc_id"), "text")
    sets = jaccard.shingle_sets(docs, "doc_id", "text", CFG).localCheckpoint()
    bands = minhash_lsh.minhash_bands(
        minhash_lsh.minhash_signatures(docs, cfg=CFG).localCheckpoint(), CFG)
    cands = minhash_lsh.minhash_candidates(bands)
    base = {(r["a"], r["b"], r["jaccard"]) for r in jaccard.jaccard_verify(
        cands, None, cfg=CFG, threshold=0.2, sets=sets).collect()}
    restricted = {(r["a"], r["b"], r["jaccard"]) for r in jaccard.jaccard_verify(
        cands, None, cfg=CFG, threshold=0.2, sets=sets,
        restrict_sets=True).collect()}
    assert base == restricted and base, "plan choice must not change results"


def test_minhash_collapse_identical_bit_identical(docs, corpus_texts):
    """VERDICT r4 #4: collapse_identical pre-collapses identical-shingle-set
    docs before banding.  The fixture corpus plants exact duplicates (base/
    exact slots + the 40-clone boilerplate group), so the collapse engages;
    full row sets (ids AND values) must be bit-identical in BOTH the exact
    mode and the production fast-accept mode."""
    def rowset(frame):
        return {tuple(r) for r in frame.collect()}

    kw = dict(cfg=CFG, threshold=CFG.jaccard_threshold, skew_mode="salt")
    base, _ = minhash_lsh.minhash_edges(docs, **kw)
    coll, _ = minhash_lsh.minhash_edges(docs, collapse_identical=True, **kw)
    assert base.columns == coll.columns
    b, c = rowset(base), rowset(coll)
    assert b == c, (len(b), len(c), list(b - c)[:3], list(c - b)[:3])
    assert b, "fixture must produce pairs (vacuous otherwise)"

    fkw = dict(est_prefilter=0.37, fast_accept=0.633, **kw)
    fbase, _ = minhash_lsh.minhash_edges(docs, **fkw)
    fcoll, _ = minhash_lsh.minhash_edges(docs, collapse_identical=True, **fkw)
    assert fbase.columns == fcoll.columns  # incl. the estimated flag
    fb, fc = rowset(fbase), rowset(fcoll)
    assert fb == fc, (len(fb), len(fc), list(fb - fc)[:3], list(fc - fb)[:3])
    # the collapse actually engaged: fewer docs survive to the rep level
    import pyspark.sql.functions as SF
    from webdedup.operators.jaccard import shingle_sets
    sets = shingle_sets(docs, cfg=CFG)
    n_classes = (sets.select(SF.xxhash64(SF.array_sort("shingles")))
                 .distinct().count())
    assert n_classes < docs.count()


def test_simhash_confirm_jaccard_dial(docs, corpus_texts):
    """SimHash precision dial (r5, motivated by the measured 250k chained
    component): confirmed edge set must equal {SimHash pairs} ∩ {exact
    Jaccard >= conf} per the local brute-force oracles, at a low conf that
    keeps everything here and a high conf that demonstrably drops the
    heavier-edited variants."""
    from webdedup.functions.signatures import all_signatures
    from webdedup.operators.jaccard import jaccard_verify

    sigs = all_signatures(docs, cfg=CFG).localCheckpoint()
    pairs = simhash_lsh.simhash_pairs(docs, cfg=CFG)
    exp_sim = oracle.simhash_pairs(corpus_texts, CFG)
    assert _pairset(pairs) == exp_sim

    for conf in (0.3, 0.95):
        got = _pairset(jaccard_verify(
            pairs.select("a", "b"), None, cfg=CFG, threshold=conf,
            sets=sigs.select("id", "shingles"), restrict_sets=True))
        exp = exp_sim & oracle.jaccard_pairs(corpus_texts, conf, CFG)
        assert got == exp, (conf, len(got), len(exp))
    # non-vacuous: the high confirmation actually drops some true
    # Hamming<=threshold pairs whose token overlap is below 0.95
    dropped = exp_sim - oracle.jaccard_pairs(corpus_texts, 0.95, CFG)
    assert dropped, "fixture has no sub-0.95-Jaccard simhash pairs"
    # pipeline semantics: the dial filters the STAR-COLLAPSED edge list
    # (simhash_edges), so each surviving edge is individually confirmed;
    # an identical-fingerprint class re-splits by overlap with its rep
    e, _ = simhash_lsh.simhash_edges(
        None, cfg=CFG, sigs=sigs.select("id", "simhash"))
    conf_edges = _pairset(jaccard_verify(
        e.select("a", "b"), None, cfg=CFG, threshold=0.3,
        sets=sigs.select("id", "shingles"), restrict_sets=True))
    full = exp_sim & oracle.jaccard_pairs(corpus_texts, 0.3, CFG)
    assert conf_edges <= full, "confirmed edge admits an unconfirmed pair"


def test_simhash_confirm_est_mode_agreement(docs, corpus_texts):
    """'est' confirmation (signature-estimate, the near-free 10^12-doc
    mode): must agree with exact confirmation outside the estimator's
    noise band — every SimHash edge with exact J >= conf+margin is kept,
    every one with exact J < conf-margin is dropped (margin ≈ 3σ of the
    128-perm estimator).  Deterministic for the seeded perms, so this is
    a hard assertion, not a flaky probabilistic one."""
    from webdedup.functions.signatures import all_signatures

    sigs = all_signatures(docs, cfg=CFG).localCheckpoint()
    e, _ = simhash_lsh.simhash_edges(
        None, cfg=CFG, sigs=sigs.select("id", "simhash"))
    edge_set = _pairset(e)
    conf, margin = 0.3, 0.15
    est = minhash_lsh.signature_jaccard(
        e.select("a", "b"), sigs.select("id", "minhash"))
    kept = {(r["a"], r["b"]) for r in
            est.filter(F.col("est_jaccard") >= conf).collect()}
    high = oracle.jaccard_pairs(corpus_texts, conf + margin, CFG)
    above_floor = oracle.jaccard_pairs(corpus_texts, conf - margin, CFG)
    assert (edge_set & high) <= kept, "est dropped a clearly-above pair"
    assert not (kept - above_floor), "est kept a clearly-below pair"
    assert kept, "vacuous fixture"


def test_minhash_empty_docs_never_pair(spark):
    """r5 ADVICE: two empty/whitespace-only docs share the sentinel empty
    signature; before the fix the uncollapsed fast-accept path banded them
    together and accepted ('e1','e2', est 1.0) while the collapsed path
    excluded them — a silent mode divergence.  Now BOTH modes exclude
    empty-signature docs from banding entirely (matching exact-verify,
    where empty-vs-anything Jaccard is 0 or 0/0 -> dropped), so the two
    modes stay bit-identical on corpora containing empty docs and no
    empty doc ever appears in a pair."""
    rows = [("e1", ""), ("e2", "   \n\t "), ("e3", ""),
            ("a1", "the quick brown fox jumps over the lazy dog again and "
                   "again until the dog finally moves away from the gate"),
            ("a2", "the quick brown fox jumps over the lazy dog again and "
                   "again until the dog finally moves away from the door"),
            ("b1", "completely unrelated text about spark catalyst plans "
                   "and shuffle partitions in a distributed engine")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    def rowset(frame):
        return {tuple(r) for r in frame.collect()}

    for kw in (dict(),  # exact-verify mode
               dict(est_prefilter=0.2, fast_accept=0.6)):  # production mode
        base, _ = minhash_lsh.minhash_edges(
            docs, cfg=CFG, threshold=0.3, skew_mode="salt", **kw)
        coll, _ = minhash_lsh.minhash_edges(
            docs, cfg=CFG, threshold=0.3, skew_mode="salt",
            collapse_identical=True, **kw)
        b, c = rowset(base), rowset(coll)
        assert b == c, (kw, b ^ c)
        ids = {x for r in b for x in (r[0], r[1])}
        assert not ids & {"e1", "e2", "e3"}, (kw, ids)
        assert ("a1", "a2") in {(r[0], r[1]) for r in b}, kw


def test_minhash_precomputed_cands_identical(spark):
    """r7: ``minhash_edges(cands=...)`` — a precomputed banded candidate
    frame built over the RAW (unfiltered) signature table, as the entry's
    shared ``_mh_band_cands`` memo builds it — must produce the bit-identical
    pair set to the internal banding path, INCLUDING on a corpus with
    empty/whitespace docs (whose sentinel signatures band-collide in the raw
    frame but are anti-joined out; band collisions are pairwise, so no other
    pair is affected)."""
    from webdedup.functions.signatures import minhash_shingle_sets

    rows = [("e1", ""), ("e2", "   \n\t "),
            ("a1", "the quick brown fox jumps over the lazy dog again and "
                   "again until the dog finally moves away from the gate"),
            ("a2", "the quick brown fox jumps over the lazy dog again and "
                   "again until the dog finally moves away from the door"),
            ("b1", "completely unrelated text about spark catalyst plans "
                   "and shuffle partitions in a distributed engine")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    fused = minhash_shingle_sets(docs, CFG).localCheckpoint()
    sigs = fused.select("id", "minhash")
    sets = fused.select("id", "shingles")
    cands = minhash_lsh.minhash_candidates(
        minhash_lsh.minhash_bands(sigs, CFG))
    # raw frame must actually contain sentinel pairs for the test to bite
    assert ("e1", "e2") in _pairset(cands)
    base = minhash_lsh.minhash_pairs(
        docs, cfg=CFG, threshold=0.3, sigs=sigs, sets=sets)
    pre = minhash_lsh.minhash_pairs(
        docs, cfg=CFG, threshold=0.3, sigs=sigs, sets=sets, cands=cands)
    assert {tuple(r) for r in base.collect()} == \
           {tuple(r) for r in pre.collect()}
    assert ("a1", "a2") in _pairset(pre)
    ids = {x for r in pre.select("a", "b").collect() for x in r}
    assert not ids & {"e1", "e2"}
