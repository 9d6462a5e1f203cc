"""Signature projections: text SimHash, vector SimHash, MinHash.

All are Arrow-batched pandas UDFs (``input_hint``: no per-row Python in the
engine sense — each batch is processed with numpy vectorization; the only
Python-level loop is over documents *within* an Arrow batch, with per-token
work done by cached md5 and numpy bit arithmetic).

Reference semantics being reproduced:

- text SimHash  : ``simhash.cpp:82-122``  — lowercase whitespace tokens,
  term-frequency weights, per-bit sign vote, 64-bit fingerprint.  Token hash
  is portable md5 (not ``std::hash``) — see ``webdedup.functions.hashing``.
- vector SimHash: ``simhash.cpp:373-391`` — seeded random hyperplanes, sign of
  dot product per bit.
- MinHash       : ``minhash_search.py:12-40`` — 128 permutations; our input is
  5-gram token shingles of webtext rather than top-|dim| indices of a CNN
  embedding (the webtext graft, SURVEY §2.2 P8).
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from webdedup.config import DedupConfig, DEFAULT
from webdedup.functions import hashing
from webdedup.functions.tokenize import shingles_py, tokenize_py

_BITPOS = np.arange(64, dtype=np.uint64)


def _simhash_of_text(text: str) -> int:
    """64-bit SimHash of one document (term-frequency weighted bit vote)."""
    counts = Counter(tokenize_py(text))
    if not counts:
        return 0
    toks = list(counts.keys())
    w = np.fromiter(counts.values(), dtype=np.int64, count=len(toks))
    hi = np.empty(len(toks), dtype=np.uint64)
    lo = np.empty(len(toks), dtype=np.uint64)
    for j, t in enumerate(toks):
        a, b = hashing.h64_split_py(t)
        hi[j], lo[j] = a, b
    h = (hi << np.uint64(32)) | lo                       # uint64 token hashes
    bits = ((h[:, None] >> _BITPOS) & np.uint64(1)).astype(np.int64)
    votes = ((2 * bits - 1) * w[:, None]).sum(axis=0)    # per-bit signed vote
    fp = np.uint64(0)
    for i in range(64):
        if votes[i] > 0:                                  # strict >, ties -> 0
            fp |= np.uint64(1) << np.uint64(i)            # simhash.cpp:114-121
    return hashing.to_signed64(int(fp))


def simhash64_udf() -> Column:
    """pandas UDF factory: text:string -> simhash:long."""

    @F.pandas_udf(LongType())
    def _udf(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: _simhash_of_text(t or ""))

    return _udf


def simhash64_col(text: Column) -> Column:
    return simhash64_udf()(text)


def minhash_udf(cfg: DedupConfig = DEFAULT) -> Column:
    """pandas UDF factory: text:string -> minhash signature array<long>.

    ``sig_i = min over shingles s of (a_i * h32(s) + b_i) mod (2^61-1)``;
    empty docs get the modulus (an impossible hash) at every position so they
    never collide with real content.
    """
    a, b = hashing.minhash_perms(cfg.minhash_perms, cfg.seed)
    p = np.uint64(hashing.MERSENNE61)
    k = cfg.shingle_k
    empty_sig = [int(p)] * cfg.minhash_perms

    @F.pandas_udf(ArrayType(LongType()))
    def _udf(texts: pd.Series) -> pd.Series:
        def sig(text: str) -> list[int]:
            sh = shingles_py(tokenize_py(text or ""), k)
            if not sh:
                return empty_sig
            hs = np.fromiter(
                (hashing.h32_py(s) for s in set(sh)),
                dtype=np.uint64,
            )
            # (perms x shingles) exact in uint64: a<2^31, h<2^32 => a*h<2^63
            vals = (a[:, None] * hs[None, :] + b[:, None]) % p
            return [int(v) for v in vals.min(axis=1)]

        return texts.map(sig)

    return _udf


def minhash_col(text: Column, cfg: DedupConfig = DEFAULT) -> Column:
    return minhash_udf(cfg)(text)


def vector_simhash_udf(cfg: DedupConfig = DEFAULT) -> Column:
    """pandas UDF factory: embedding:array<float> -> hyperplane simhash:long.

    Seeded projection matrix generated once on the driver and shipped in the
    UDF closure (the distributed analog of ``simhash.cpp:152-174``'s
    ``srand(42)`` hyperplanes); per batch it is a single matmul.
    """
    planes = hashing.hyperplanes(cfg.hyperplane_bits, cfg.embedding_dim, cfg.seed)
    nbits = cfg.hyperplane_bits

    @F.pandas_udf(LongType())
    def _udf(vecs: pd.Series) -> pd.Series:
        X = np.stack(vecs.to_numpy()).astype(np.float64)   # (batch, dim)
        bits = (X @ planes.T) > 0                          # (batch, nbits)
        weights = (1 << np.arange(nbits, dtype=np.int64))
        packed = (bits.astype(np.int64) * weights).sum(axis=1)
        return pd.Series(packed)

    return _udf
