"""Plan layer: end-to-end pipeline orchestration, checkpoint/resume, and
lineage + metrics recording.

The reference's "plan" is hard-coded control flow in ``run_pipeline.py``'s
``main()`` with ad-hoc .npy/.pkl caches for resume (SURVEY §3.1, §4).  Here a
pipeline is a sequence of named stages, each a DataFrame function whose
output is persisted as a parquet stage table (Iceberg-shaped in production);
resume = skip stages whose table already exists, which is exactly the
reference's ``if os.path.exists(cache): load`` pattern made declarative and
cluster-safe.
"""
