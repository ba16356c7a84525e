"""URL column functions (reference utils.ts:17-69).

F3: normalize (strip query string + fragment); F4: extension predicates.
All native expressions — no UDF, so Catalyst can fold/push them.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_url(col: Column) -> Column:
    """Drop ``?query`` and ``#fragment`` (utils.ts:17-24)."""
    return F.regexp_replace(col, r"[?#].*$", "")


def url_prefix(col: Column, pattern: str = r"^(https?://[^/]+/[^/]+)") -> Column:
    """Computed prefix column enabling equi-joins instead of LIKE scans."""
    return F.regexp_extract(col, pattern, 1)


def has_extension(col: Column, extensions: Sequence[str]) -> Column:
    """Case-insensitive dotted-extension match (utils.ts:48-58,
    mcp/src/server.ts:70-76): exts normalized to lowercase with a dot."""
    lowered = F.lower(col)
    norm = [e.lower() if e.startswith(".") else "." + e.lower() for e in extensions]
    pred = F.lit(False)
    for ext in norm:
        pred = pred | lowered.endswith(ext)
    return pred
