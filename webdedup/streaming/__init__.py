"""Structured Streaming surface.

The reference has NO streaming operators (SURVEY §2.10) — its only "stream"
is an HTTP upload loop.  The graft's batch pipeline is therefore the core;
this package adds the minimal streaming ingest a production web-crawl feed
would use, built on the same stage functions (signatures are per-row pure
projections, so they lift to streams unchanged).
"""
