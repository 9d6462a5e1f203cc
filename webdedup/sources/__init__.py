"""Sources & sinks: testdata loaders, the synthetic web_pages corpus
generator, and stage-table checkpoint IO.

The reference's "sources" are a recursive file scan plus ad-hoc .npy/.pkl/
.json caches (SURVEY §2.1 S1-S10).  Here every input/output is a columnar
table with a declared schema; the cache/resume story is handled by
``webdedup.plans.checkpoint`` writing parquet stage tables (Iceberg-shaped:
in production these writes target Iceberg — the sandbox has no Iceberg
runtime, parquet is the stand-in with identical DataFrame semantics).
"""
