"""html:binary -> text:string extraction (Arrow-batched, deterministic).

The webtext analog of the reference's image-decode source
(``Image.open(p).convert("RGB")``, ``run_pipeline.py:175``): the per-row
invariant required by BASELINE.json ``input_hint`` is *byte-identical
extracted text per url*, independent of batch boundaries and partitioning —
guaranteed here because extraction is a pure function of the html bytes.

This is intentionally a small deterministic extractor (tag stripping +
whitespace normalization), not a full HTML5 parser: the container has no
html parsing libs, and determinism matters more than fidelity for the
dedup semantics.  The UDF is the extension point (SURVEY §2.9) — swap in a
real extractor with the same signature on a cluster.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

_SCRIPT_RE = re.compile(rb"<(script|style)\b.*?</\1\s*>", re.S | re.I)
_TAG_RE = re.compile(rb"<[^>]*>")
_WS_RE = re.compile(r"\s+")


def extract_text_py(html: bytes | None) -> str:
    if not html:
        return ""
    body = _SCRIPT_RE.sub(b" ", html)
    body = _TAG_RE.sub(b" ", body)
    s = body.decode("utf-8", errors="replace")
    return _WS_RE.sub(" ", s).strip()


def extract_text_udf(extractor: str = "regex") -> Column:
    """Arrow-batched extraction UDF for the NAMED extractor (functions.
    registry — the reference's dynamic-import surface,
    run_pipeline.py:133-159).  Default 'regex' is ``extract_text_py``."""
    from webdedup.functions.registry import get_extractor

    fn = get_extractor(extractor)

    @F.pandas_udf(StringType())
    def _udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # iterator form: one Arrow batch at a time, constant memory
        for html in batches:
            yield html.map(fn)

    return _udf


def with_extracted_text(pages: DataFrame, out_col: str = "text",
                        extractor: str = "regex") -> DataFrame:
    """web_pages(url, warc_ts, html, ...) -> + extracted text column.

    Drops the html column afterwards so downstream stages never carry the
    binary payload through a shuffle (column pruning by construction — at
    100 TB the html column dominates and must die at the scan boundary).
    """
    return pages.withColumn(
        out_col, extract_text_udf(extractor)(F.col("html"))).drop("html")
