"""Engine-portable deterministic hashing.

One hash family, three implementations that agree bit-for-bit:

- ``*_py``   : Python/numpy (used inside Arrow-batched pandas UDFs — the
               production path);
- ``*_col``  : PySpark Column expressions (used where a whole stage can stay
               JVM-side in WholeStageCodegen);
- ``*_sql``  : DuckDB SQL fragments (used by ``__spark_entry__.oracle_sql`` so
               the driver's Spark-vs-DuckDB comparison is exact).

Base primitive: ``h60(s) = int(md5(s)[:15 hex], 16)`` — a 60-bit non-negative
integer that fits a signed 64-bit long in every engine.  ``h32`` is the first
8 hex chars (32 bits), used where products must stay inside uint64
(MinHash universal hashing).

The reference hashes tokens with ``std::hash<string>`` (``simhash.cpp:97-102``)
— implementation-defined and unusable for distributed determinism; md5 is the
portable replacement (SURVEY §2.8).
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

# Mersenne prime 2^61 - 1: modulus for MinHash universal hashing.
# a (31-bit) * h32 (32-bit) <= 2^63 < 2^64, so the product is exact in uint64.
MERSENNE61 = (1 << 61) - 1
PERM_A_BITS = 31


# ---------------------------------------------------------------------------
# Python / numpy
# ---------------------------------------------------------------------------

# NOTE: deliberately NO lru_cache on these.  Shingle/anchor inputs are
# mostly unique at scale, so a big global cache degenerates into pure
# eviction churn — and because Spark REUSES python workers across stages,
# a full cache poisons every later UDF stage in the session (measured 2-7x
# progressive slowdown).  Token-level caching, where the vocabulary is
# naturally small, is done with bounded per-batch dicts inside the UDFs.

def h60_py(s: str) -> int:
    """60-bit md5-derived hash (first 15 hex chars)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def h64_split_py(s: str) -> tuple[int, int]:
    """(hi32, lo32): first/second 8 hex chars of md5 — a portable 64-bit hash
    delivered as two 32-bit halves so SQL engines never overflow."""
    d = hashlib.md5(s.encode("utf-8")).hexdigest()
    return int(d[:8], 16), int(d[8:16], 16)


def h32_py(s: str) -> int:
    """32-bit md5-derived hash (first 8 hex chars)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)


def to_signed64(u: int) -> int:
    """Reinterpret an unsigned 64-bit value as signed (two's complement)."""
    return u - (1 << 64) if u >= (1 << 63) else u


def minhash_perms(num_perms: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Seeded (a, b) coefficients for ``sig_i = min((a_i*h32 + b_i) % p)``.

    Generated once on the driver from the fixed seed and broadcast via UDF
    closure — the distributed analog of the reference's ``srand(42)``
    hyperplane generation (``simhash.cpp:149-174``).
    """
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 1 << PERM_A_BITS, size=num_perms, dtype=np.int64) | 1
    b = rng.randint(0, 1 << PERM_A_BITS, size=num_perms, dtype=np.int64)
    return a.astype(np.uint64), b.astype(np.uint64)


def hyperplanes(num_bits: int, dim: int, seed: int) -> np.ndarray:
    """Seeded gaussian hyperplanes for vector SimHash — semantics of the
    reference's Box-Muller generation under ``srand(42)``
    (``simhash.cpp:152-174``), realized as ``RandomState(seed).randn``."""
    return np.random.RandomState(seed).randn(num_bits, dim)


# ---------------------------------------------------------------------------
# PySpark Column expressions
# ---------------------------------------------------------------------------

def h60_col(c: Column) -> Column:
    """Spark: 60-bit md5 hash of a string column (JVM-side, codegen-able)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def h32_col(c: Column) -> Column:
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def h64_hi_col(c: Column) -> Column:
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def h64_lo_col(c: Column) -> Column:
    return F.conv(F.substring(F.md5(c), 9, 8), 16, 10).cast("long")


# ---------------------------------------------------------------------------
# DuckDB SQL fragments (oracle side)
# ---------------------------------------------------------------------------

def h60_sql(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def h32_sql(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 8))::BIGINT)"


def h64_hi_sql(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 8))::BIGINT)"


def h64_lo_sql(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 9, 8))::BIGINT)"
