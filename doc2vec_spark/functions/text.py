"""Text scalar functions (reference utils.ts:88-90, doc2vec.ts:2002-2028).

F5: whitespace token estimate; F14: embedding-input truncation; plus the
BPE-ish regex token counter used by the text-analysis operators.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Splits letters / digit runs / single punctuation — a deterministic,
# language-agnostic approximation of a BPE pre-tokenizer.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

MAX_EMBED_CHARS = 32_764  # 8191 tokens x 4 chars (doc2vec.ts:2006-2008)


def token_count_ws(col: Column) -> Column:
    """Whitespace token count (utils.ts:88-90)."""
    return F.size(F.split(F.trim(col), r"\s+"))


def token_count_regex(col: Column, pattern: str = BPE_ISH_PATTERN) -> Column:
    # group index 0 (whole match): Spark defaults to group 1, DuckDB to 0
    return F.size(F.regexp_extract_all(col, F.lit(pattern), 0))


def truncate_chars(col: Column, max_chars: int = MAX_EMBED_CHARS) -> Column:
    """Truncate before the (expensive) embedding stage (doc2vec.ts:2017-2028)."""
    return F.substring(col, 1, max_chars)
