"""Embedding similarity search: brute-force cosine top-k / threshold pairs,
and a hyperplane-LSH-bucketed approximate variant for scale.

The reference's analog is FAISS ``IndexFlatL2.search`` (``faiss_search.py:
41-45``) and the C++ SimHashLSH vector index (``simhash.cpp:149-341``).
Spark-first shapes:

- brute-force: block-nested-loop join with the smaller side broadcast,
  cosine as a pure Catalyst ``zip_with``/``aggregate`` expression (double
  math, deterministic), then a ranking window for top-k.  This is the
  oracle-checked baseline — O(n^2) but exact.
- LSH-bucketed: seeded random-hyperplane signature (``vector_simhash_udf``)
  -> bucket by signature prefix bands -> cosine only within buckets.  The
  scale path: candidate volume drops by ~2^bits/band factor.

Scores are rounded to 6 decimals (both engines compute in float64; rounding
removes last-ulp associativity noise from the cross-engine value-hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from webdedup.config import DedupConfig, DEFAULT
from webdedup.functions.signatures import vector_simhash_udf


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v,
    )


def with_norm(df: DataFrame, vec_col: str = "embedding",
              out_col: str = "norm") -> DataFrame:
    return df.withColumn(out_col, F.sqrt(_dot(F.col(vec_col), F.col(vec_col))))


def cosine_pairs(df: DataFrame, id_col: str = "vec_id",
                 vec_col: str = "embedding",
                 threshold: float = 0.9) -> DataFrame:
    """(a, b, cosine) for all pairs with cosine >= threshold — exact.

    Embedding-cosine near-dup detection; broadcast the right side when it
    fits (Catalyst chooses BroadcastNestedLoopJoin for the cross join)."""
    v = with_norm(df.select(F.col(id_col).alias("id"),
                            F.col(vec_col).alias("vec")), "vec")
    v = v.localCheckpoint(eager=False)  # both cross-join arms
    a = v.select(F.col("id").alias("a"), F.col("vec").alias("va"),
                 F.col("norm").alias("na"))
    b = v.select(F.col("id").alias("b"), F.col("vec").alias("vb"),
                 F.col("norm").alias("nb"))
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        a.crossJoin(b)
        .filter(F.col("a") < F.col("b"))
        .withColumn("cosine", F.round(cos, 6))
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )


def cosine_topk(queries: DataFrame, corpus: DataFrame | None = None,
                id_col: str = "vec_id", vec_col: str = "embedding",
                k: int = 10) -> DataFrame:
    """(query_id, neighbor_id, cosine, rank) — exact top-k by cosine.

    Rank orders by (rounded cosine desc, neighbor_id asc): fully
    deterministic and reproducible across engines.  Self-matches excluded.
    """
    if corpus is None:
        corpus = queries
    q = with_norm(queries.select(F.col(id_col).alias("query_id"),
                                 F.col(vec_col).alias("qv")), "qv", ).withColumnRenamed("norm", "qn")
    c = with_norm(corpus.select(F.col(id_col).alias("neighbor_id"),
                                F.col(vec_col).alias("cv")), "cv").withColumnRenamed("norm", "cn")
    cos = _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        q.crossJoin(F.broadcast(c))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(cos, 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def lsh_cosine_pairs(df: DataFrame, id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     threshold: float = 0.9,
                     cfg: DedupConfig = DEFAULT,
                     bands: int = 4,
                     probe_bits: int = 0) -> DataFrame:
    """Approximate cosine near-dup pairs: hyperplane signature -> band
    buckets -> exact cosine on the deduped id pairs.

    Plan shape (the 100 TB path): the band explode and the pair-dedup move
    ONLY (id, band_id, band_key) longs; full embedding vectors are joined
    back exactly once per side for the cosine verify — mirroring
    ``simhash_lsh.hamming_verify``.  (The first cut carried two float-arrays
    per row through ``dropDuplicates`` and spent 2/3 of the bench there.)

    Recall/cost dial — the analog of FAISS ``index_type``/``nprobe``
    (``faiss_search.py:10-38``, ``run_pipeline.py:284-285``):

    - ``bands``: more bands of fewer bits => higher recall, more candidates.
      With ``hyperplane_bits=16`` and 4 bands of 4 bits, a pair at angle θ
      collides on a band with prob (1-θ/π)^4; at cosine 0.9 (θ≈26°) ≈ 0.53
      per band → ≈ 0.95 for ≥1 of 4 bands.
    - ``probe_bits``: multi-probe — the left arm ALSO probes every band key
      within Hamming distance <= probe_bits of its own (width·probe extra
      keys per band), catching pairs whose band keys almost agree.  At
      cosine 0.3 (θ≈72°, per-bit p≈0.60) recall rises ≈0.42 → ≈0.92 for
      probe_bits=1 at ~5x the candidate volume.  ``tests/test_matchers.py``
      measures the sweep.
    """
    # explode fan-out guard — see simhash_lsh.simhash_bands (a small
    # embedding scan arrives in 1-2 partitions; bands explode 4-20x)
    n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions",
                                          "32"))
    if df.rdd.getNumPartitions() < n_part:
        df = df.repartition(n_part)
    sig = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"),
                    vector_simhash_udf(cfg)(F.col(vec_col)).alias("sig"))
    # norms once per VECTOR here (n rows), not per candidate PAIR below
    # (~n^2/selectivity rows): Spark's array fold is a per-row interpreted
    # higher-order function, so shaving 2 of the 3 folds per pair is ~3x on
    # the verify stage
    sig = with_norm(sig, "vec", "nrm")
    sig = sig.localCheckpoint(eager=False)  # UDF shared by band + verify arms
    width = cfg.hyperplane_bits // bands

    def _keys(probe: int) -> list:
        """band structs: exact key, plus probed (bit-flipped) keys."""
        out = []
        for t in range(bands):
            key = (F.shiftrightunsigned(F.col("sig"), t * width)
                   .bitwiseAND(F.lit((1 << width) - 1)))
            out.append(F.struct(F.lit(t).alias("band_id"),
                                key.alias("band_key")))
            if probe >= 1:
                for i in range(width):
                    out.append(F.struct(
                        F.lit(t).alias("band_id"),
                        key.bitwiseXOR(F.lit(1 << i)).alias("band_key")))
        return out

    right = (sig.select("id", F.explode(F.array(*_keys(0))).alias("tb"))
             .select(F.col("id").alias("b"), "tb.band_id", "tb.band_key"))
    left = (sig.select("id", F.explode(F.array(*_keys(probe_bits))).alias("tb"))
            .select(F.col("id").alias("a"), "tb.band_id", "tb.band_key"))
    cands = (
        left.join(right, ["band_id", "band_key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    va = sig.select(F.col("id").alias("a"), F.col("vec").alias("va"),
                    F.col("nrm").alias("na"))
    vb = sig.select(F.col("id").alias("b"), F.col("vec").alias("vb"),
                    F.col("nrm").alias("nb"))
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        cands.join(va, "a").join(vb, "b")
        .withColumn("cosine", F.round(cos, 6))
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )


def vector_signatures(df: DataFrame, id_col: str = "vec_id",
                      vec_col: str = "embedding",
                      cfg: DedupConfig = DEFAULT) -> DataFrame:
    """(vec_id, sig) — seeded hyperplane SimHash of each embedding
    (``simhash.cpp:373-391`` semantics); self-similar vectors share sigs."""
    return df.select(F.col(id_col).alias("vec_id"),
                     vector_simhash_udf(cfg)(F.col(vec_col)).alias("sig"))


# ---------------------------------------------------------------------------
# IVF — the second ANN index type (faiss IndexIVFFlat analog)
# ---------------------------------------------------------------------------

def ivf_assignments(df: DataFrame, id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    k_centroids: int = 16, nprobe: int = 2) -> DataFrame:
    """(id, vec, rank, cid): each vector's ``nprobe`` nearest centroids.

    The index-type dial next to the hyperplane LSH scheme — reference
    ``faiss_search.py:10-38`` selects flat/IVF and sets ``nprobe``.  Coarse
    quantizer: the ``k_centroids`` corpus vectors with the smallest
    ``md5(vec_id)`` (a deterministic random sample — standard IVF random
    -subset initialization, no iterative training, and — unlike k-means —
    bit-reproducible in DuckDB, so the whole operator is oracle-checkable).
    Assignment is a broadcast of the tiny centroid table + one Catalyst
    fold per (vector, centroid); rank is by (distance, cid), fully
    deterministic.  rank=1 is the storage list; ranks 1..nprobe are the
    probe lists.

    At 10^12 docs: k_centroids scales to ~sqrt(n) lists, the centroid table
    stays broadcastable (k·dim floats), assignment stays a map-side
    broadcast join, and each vector shuffles to exactly one list — the
    candidate join below is then list-pruned like any equi-join.
    """
    v = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    v = v.localCheckpoint(eager=False)  # reused: centroid pick + assignment
    cents = (v.withColumn("_h", F.md5(F.col("id").cast("string")))
             .orderBy("_h", "id").limit(k_centroids)
             .select(F.col("id").alias("cid"), F.col("vec").alias("cvec")))
    dist2 = F.aggregate(
        F.zip_with("vec", "cvec",
                   lambda x, y: (x.cast("double") - y.cast("double"))
                   * (x.cast("double") - y.cast("double"))),
        F.lit(0.0), lambda acc, x: acc + x)
    w = Window.partitionBy("id").orderBy(F.asc("_d2"), F.asc("cid"))
    return (
        v.crossJoin(F.broadcast(cents))
        .withColumn("_d2", F.round(dist2, 6))  # 6dp: stable cross-engine rank
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= nprobe)
        .select("id", "vec", "rank", "cid")
    )


def ivf_cosine_pairs(df: DataFrame, id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     threshold: float = 0.9,
                     k_centroids: int = 16, nprobe: int = 2) -> DataFrame:
    """(a, b, cosine): IVF-pruned exact-cosine pairs — candidates are pairs
    where one side's ``nprobe`` probe lists contain the other side's
    STORAGE list (rank-1 centroid), mirroring a faiss IVF query over every
    corpus vector.  Verification joins vectors back by id (narrow candidate
    rows through the dedup, the ``lsh_cosine_pairs`` plan shape)."""
    assign = ivf_assignments(df, id_col, vec_col, k_centroids, nprobe)
    assign = assign.localCheckpoint(eager=False)  # probe + storage + vectors
    probe = assign.select(F.col("id").alias("a"), "cid")
    store = assign.filter(F.col("rank") == 1).select(
        F.col("id").alias("b"), "cid")
    cands = (
        probe.join(store, "cid")
        .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    vecs = (assign.filter(F.col("rank") == 1)
            .select("id", "vec", F.sqrt(_dot(F.col("vec"), F.col("vec")))
                    .alias("nrm")))
    va = vecs.select(F.col("id").alias("a"), F.col("vec").alias("va"),
                     F.col("nrm").alias("na"))
    vb = vecs.select(F.col("id").alias("b"), F.col("vec").alias("vb"),
                     F.col("nrm").alias("nb"))
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        cands.join(va, "a").join(vb, "b")
        .withColumn("cosine", F.round(cos, 6))
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )
