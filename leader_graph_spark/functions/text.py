"""Text-analysis column functions for the training-data pipeline.

All JVM-side expressions (regexp/length arithmetic) — designed so the
same formulas are expressible in the DuckDB oracle SQL. Exercised by
plans/text_queries.py over the ``documents`` table.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def token_count(c: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(F.split(F.trim(_c(c)), r"\s+"))


def word_tokens(c: Column | str) -> Column:
    """BPE-ish tokenization via regexp: runs of word chars or single
    non-space symbols."""
    return F.regexp_extract_all(_c(c), F.lit(r"\w+|[^\w\s]"), 0)
