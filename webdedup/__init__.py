"""webdedup — a PySpark-native near-duplicate detection + clustering engine
for webtext, built from scratch with the query/data-processing capabilities of
the reference image-dedup pipeline (``tanphong-sudo/image-deduplication-project``,
read-only at /root/reference).

The reference is a single-node Python/C++ pipeline: hash signatures (SimHash /
MinHash / FAISS) -> LSH candidate lookup -> threshold verify -> union-find
clustering -> representative selection -> pairwise precision/recall evaluation
(see SURVEY.md for the file:line operator inventory).  This package re-expresses
each stage Spark-first:

- signatures are columns produced by vectorized Arrow/pandas UDFs
  (``webdedup.functions``), never per-row Python;
- LSH "hash tables" (reference ``simhash.cpp:362``) are not materialized at
  all — a bucket is just a ``(band_id, band_key)`` group and lookup is a
  shuffle equi-join (``webdedup.operators``);
- union-find (reference ``run_pipeline.py:190-217``) becomes iterative
  large-star/small-star connected components on an edge DataFrame
  (``webdedup.operators.components``);
- stage outputs are parquet tables with declared schemas, checkpointable and
  resumable (``webdedup.plans``).

Every hash used anywhere is md5-derived and therefore engine-portable: the
same value is computable in PySpark, numpy UDFs, and the DuckDB oracle SQL
(``webdedup.functions.hashing``), which is what makes the driver's
Spark-vs-DuckDB correctness gate exact rather than approximate.
"""

from webdedup.config import DedupConfig

__all__ = ["DedupConfig"]
__version__ = "0.1.0"
