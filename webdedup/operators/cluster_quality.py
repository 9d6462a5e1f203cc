"""Embedding cluster-quality metrics: silhouette, Davies-Bouldin,
Calinski-Harabasz — one row over a labeled embedding table.

Reference analog: ``src/embedding_evaluation/clustering_metrics.py:5-40``
(sklearn ``silhouette_score`` / ``davies_bouldin_score`` /
``calinski_harabasz_score`` over an embedding matrix + labels).  Same
formulas, Euclidean distance, re-expressed as pure DataFrame aggregations
(zero UDFs):

- silhouette:  s(i) = (b(i) - a(i)) / max(a(i), b(i)) with a(i) the mean
  distance to the OTHER members of i's cluster (divisor |c|-1) and b(i) the
  min over other clusters of the mean distance to their members; s(i) = 0
  for singleton clusters (sklearn convention).  Score = mean over points.
- Davies-Bouldin:  S_k = mean distance of cluster k's points to its
  centroid; R_jk = (S_j + S_k) / ||mu_j - mu_k||; DB = mean_j max_{k!=j} R_jk.
- Calinski-Harabasz:  [sum_k n_k ||mu_k - mu||^2 / (K-1)] /
  [sum_k sum_{i in k} ||x_i - mu_k||^2 / (n - K)].

Scale notes: silhouette is inherently O(n^2) pairwise (as in sklearn) — at
web scale pass ``silhouette_sample_per_cluster`` to bound it: the pairwise
part then runs on a DETERMINISTIC stratified sample (the ``m`` smallest-
md5(id) members of each cluster — the distributed analog of sklearn's
``silhouette_score(sample_size=...)``, which also scores a sample against
itself), capping the cross join at (K·m)^2 rows while DB and CH stay exact.
DB and CH are single-pass (long-form posexplode -> centroid join), linear
in n·dim with one shuffle each, and scale as-is.  Floating-point: every
reduction is a sum/avg of doubles whose accumulated associativity error
(~1e-12 relative) is far under the 6-decimal rounding both engines apply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cluster_quality(df: DataFrame, id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    label_col: str = "label",
                    silhouette_sample_per_cluster: int | None = None,
                    silhouette_exact_max_rows: int = 100_000,
                    silhouette_auto_sample: int = 256) -> DataFrame:
    """One-row frame: (silhouette, davies_bouldin, calinski_harabasz).

    ``silhouette_sample_per_cluster=m`` bounds the O(n^2) silhouette stage
    to a per-cluster sample of ``m`` points (see module doc); ``None`` =
    exact over all points.  With ``m`` >= every cluster size the result is
    identical to exact.

    Safety default: when exact is requested (``None``) over more than
    ``silhouette_exact_max_rows`` input rows, the sampled path auto-engages
    with ``silhouette_auto_sample`` points per cluster instead of building
    an n² cross join — a naive caller on a 10⁶-row table gets the bounded
    deterministic estimate, not an accidental 10¹²-row stage.  Pass
    ``silhouette_exact_max_rows=None`` to force exact at any size (the
    cost is then on the caller, explicitly).  The guard costs one
    ``limit(threshold+1).count()`` probe (stops scanning at the bound)
    and engages only above the threshold, so oracle-checked small-table
    calls are value-identical to before.  The output row always carries
    ``silhouette_sampled`` (true when the sampled path ran — explicitly
    or via the guard, which also emits a ``UserWarning``) so consumers
    can tell estimate from exact.
    """
    if (silhouette_sample_per_cluster is None
            and silhouette_exact_max_rows is not None):
        # cheap bound: scan stops once threshold+1 rows are seen, instead of
        # a full count() of the input on every default-path call
        over = df.limit(silhouette_exact_max_rows + 1).count()
        if over > silhouette_exact_max_rows:
            import warnings
            warnings.warn(
                f"cluster_quality: input exceeds {silhouette_exact_max_rows}"
                f" rows; silhouette auto-switched to the deterministic"
                f" sampled estimate ({silhouette_auto_sample}/cluster)."
                f" Output row carries silhouette_sampled=true; pass"
                f" silhouette_exact_max_rows=None to force exact.",
                stacklevel=2)
            silhouette_sample_per_cluster = silhouette_auto_sample
    sil_sampled = silhouette_sample_per_cluster is not None
    v = df.select(
        F.col(id_col).alias("id"), F.col(label_col).alias("lbl"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vec"))
    v = v.localCheckpoint(eager=False)  # pairwise + long-form consumers

    if silhouette_sample_per_cluster is None:
        sil_src = v
    else:
        w_samp = Window.partitionBy("lbl").orderBy(
            F.md5(F.col("id").cast("string")), "id")
        sil_src = (v.withColumn("_sk", F.row_number().over(w_samp))
                   .filter(F.col("_sk") <= silhouette_sample_per_cluster)
                   .drop("_sk"))

    # ---- silhouette: pairwise Euclidean over the (sampled) corpus ----
    a = sil_src.select(F.col("id").alias("i"), F.col("lbl").alias("li"),
                       F.col("vec").alias("va"))
    b = sil_src.select(F.col("id").alias("j"), F.col("lbl").alias("lj"),
                       F.col("vec").alias("vb"))
    d2 = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, x: acc + x)
    pairs = (a.crossJoin(b).filter(F.col("i") != F.col("j"))
             .select("i", "li", "lj", F.sqrt(d2).alias("d")))
    md = pairs.groupBy("i", "li", "lj").agg(F.avg("d").alias("m"))
    a_i = md.filter(F.col("li") == F.col("lj")).select(
        "i", F.col("m").alias("ad"))
    b_i = (md.filter(F.col("li") != F.col("lj"))
           .groupBy("i").agg(F.min("m").alias("bd")))
    s = F.when(F.col("ad").isNull() | F.col("bd").isNull(), F.lit(0.0)) \
         .otherwise((F.col("bd") - F.col("ad")) / F.greatest("ad", "bd"))
    sil_row = (sil_src.select(F.col("id").alias("i"))
               .join(a_i, "i", "left").join(b_i, "i", "left")
               .agg(F.round(F.avg(s), 6).alias("silhouette")))

    # ---- long-form points / centroids (shared by DB + CH) ----
    pts = v.select("id", "lbl", F.posexplode("vec").alias("pos", "val"))
    pts = pts.localCheckpoint(eager=False)
    cent = (pts.groupBy("lbl", "pos").agg(F.avg("val").alias("c"))
            .localCheckpoint(eager=False))
    counts = v.groupBy("lbl").agg(F.count(F.lit(1)).alias("nk"))
    pc = pts.join(cent, ["lbl", "pos"])
    # per-point squared distance to own centroid
    pdist = (pc.groupBy("id", "lbl")
             .agg(F.sqrt(F.sum((F.col("val") - F.col("c"))
                               * (F.col("val") - F.col("c")))).alias("dd")))
    sk = pdist.groupBy("lbl").agg(F.avg("dd").alias("s"))

    # ---- Davies-Bouldin ----
    ca = cent.select(F.col("lbl").alias("lj"), "pos", F.col("c").alias("cj"))
    cb = cent.select(F.col("lbl").alias("lk"), "pos", F.col("c").alias("ck"))
    m = (ca.join(cb, "pos").filter(F.col("lj") != F.col("lk"))
         .groupBy("lj", "lk")
         .agg(F.sqrt(F.sum((F.col("cj") - F.col("ck"))
                           * (F.col("cj") - F.col("ck")))).alias("mm")))
    r = (m.join(sk.select(F.col("lbl").alias("lj"), F.col("s").alias("sj")), "lj")
         .join(sk.select(F.col("lbl").alias("lk"), F.col("s").alias("skk")), "lk")
         .groupBy("lj")
         .agg(F.max((F.col("sj") + F.col("skk")) / F.col("mm")).alias("rr")))
    db_row = r.agg(F.round(F.avg("rr"), 6).alias("davies_bouldin"))

    # ---- Calinski-Harabasz ----
    gm = pts.groupBy("pos").agg(F.avg("val").alias("g"))
    within_row = pc.agg(F.sum((F.col("val") - F.col("c"))
                              * (F.col("val") - F.col("c"))).alias("w"))
    btw_row = (cent.join(gm, "pos")
               .groupBy("lbl")
               .agg(F.sum((F.col("c") - F.col("g"))
                          * (F.col("c") - F.col("g"))).alias("ss"))
               .join(counts, "lbl")
               .agg(F.sum(F.col("nk") * F.col("ss")).alias("btw")))
    dims_row = v.agg(F.count(F.lit(1)).alias("n"),
                     F.countDistinct("lbl").alias("kk"))
    ch_row = (btw_row.crossJoin(within_row).crossJoin(dims_row)
              .select(F.round(
                  (F.col("btw") / (F.col("kk") - 1))
                  / (F.col("w") / (F.col("n") - F.col("kk"))), 6)
                  .alias("calinski_harabasz")))

    return (sil_row.crossJoin(db_row).crossJoin(ch_row)
            .withColumn("silhouette_sampled", F.lit(sil_sampled)))
