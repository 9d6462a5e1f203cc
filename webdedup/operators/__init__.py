"""Dedup/query operators (DataFrame-in/DataFrame-out stage functions).

Each module implements one matcher or pipeline stage from SURVEY §2's
operator inventory; all take and return DataFrames so stages compose into a
single declarative plan that Catalyst optimizes end-to-end.
"""
