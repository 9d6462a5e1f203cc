"""Scalar/vector functions: portable hashing, tokenization, signatures.

Everything here is deliberately computable in three engines — PySpark column
expressions, numpy inside Arrow-batched pandas UDFs, and DuckDB oracle SQL —
from the same md5-derived integer hashes.  Distributed determinism is a hard
requirement (the reference's ``std::hash`` at ``simhash.cpp:97-102`` is
platform-defined and would be a correctness bug on a cluster; see SURVEY §2.8).
"""
