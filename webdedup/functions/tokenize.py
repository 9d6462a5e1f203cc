"""Tokenization + shingling, portable across Spark / numpy / DuckDB.

Semantics mirror the reference's text SimHash tokenizer: lowercase +
whitespace split with term-frequency weights (``simhash.cpp:84-93``).  Empty
tokens from leading/trailing/repeated whitespace are dropped in every engine.

Whitespace is the JAVA ``\\s`` class — exactly ``[ \\t\\n\\x0b\\f\\r]`` — in
ALL THREE engines:

- Spark ``F.split`` compiles ``\\s+`` with java.util.regex (ASCII-only);
- the Python tokenizer splits on the same explicit ASCII class (NOT
  ``str.split()``, which also splits on Unicode whitespace — NBSP, \\x85,
  \\u2028... — and would silently diverge from the Catalyst paths for any
  text containing them);
- DuckDB/RE2's ``\\s`` is ``[ \\t\\n\\f\\r]`` (no \\x0b), so the oracle
  pattern adds it explicitly.

``tests/test_textstats_similarity.py`` pins this with NBSP/\\x85/\\x0b
inputs across the UDF and Catalyst paths.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = r"\s+"                     # Java regex (Spark side)
TOKEN_SPLIT_SQL_RE = r"[\s\x0b]+"           # RE2 (DuckDB side): \s lacks \x0b

_ASCII_WS = re.compile(r"[ \t\n\x0b\f\r]+")  # == Java \s, engine-independent

# str.split() treats \x1c-\x1f (FS/GS/RS/US) as whitespace; Java \s does not.
# Those four are the ONLY ASCII chars where the two disagree, so ASCII text
# without them can take the C-speed str.split fast path (regex splitting
# measured ~2.6x slower on the signature stage end-to-end).
_SPLIT_DISAGREE = re.compile(r"[\x1c-\x1f]")


# --- Python -----------------------------------------------------------------

def tokenize_py(text: str) -> list[str]:
    if text.isascii() and _SPLIT_DISAGREE.search(text) is None:
        return text.lower().split()
    return [t for t in _ASCII_WS.split(text.lower()) if t]


def shingles_py(tokens: list[str], k: int) -> list[str]:
    if len(tokens) < k:
        return [" ".join(tokens)] if tokens else []
    return [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]


# --- Spark ------------------------------------------------------------------

def tokens_col(text: Column) -> Column:
    """array<string> of lowercase whitespace tokens, empties removed."""
    return F.filter(F.split(F.lower(text), TOKEN_SPLIT_RE), lambda t: t != "")


def shingles_col(tokens: Column, k: int) -> Column:
    """array<string> of k-gram shingles (space-joined token windows).

    Docs shorter than k tokens contribute their whole token stream as one
    shingle, matching ``shingles_py``.  Pure Catalyst: sequence + transform +
    slice, no UDF.
    """
    n = F.size(tokens)
    full = F.transform(
        F.sequence(F.lit(0), n - F.lit(k)),
        lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, k)),
    )
    short = F.when(n > F.lit(0), F.array(F.concat_ws(" ", tokens))).otherwise(
        F.array().cast("array<string>")
    )
    return F.when(n >= F.lit(k), full).otherwise(short)


# --- DuckDB SQL -------------------------------------------------------------

def tokens_sql(text_expr: str) -> str:
    return (
        f"list_filter(regexp_split_to_array(lower({text_expr}), '[\\s\\x0b]+'),"
        f" t -> t <> '')"
    )


def shingles_sql(tokens_expr: str, k: int) -> str:
    """DuckDB list comprehension producing the same shingle list."""
    return (
        f"CASE WHEN len({tokens_expr}) >= {k} THEN "
        f"[array_to_string(({tokens_expr})[i:i+{k - 1}], ' ') "
        f" for i in range(1, len({tokens_expr}) - {k - 1} + 1)] "
        f"WHEN len({tokens_expr}) > 0 THEN [array_to_string({tokens_expr}, ' ')] "
        f"ELSE [] END"
    )
