"""Content hashing (reference utils.ts:6-15).

F1: sha256 hex content hash -> native ``sha2(col, 256)``.
F2: md5 -> UUID-shaped string (8-4-4-4-12), the reference's chunk_id->point-id
mapping for Qdrant (utils.ts:10-15, 76-86).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sha256_hex(col: Column) -> Column:
    """Lowercase hex sha256 — identical output to Node crypto and DuckDB."""
    return F.sha2(col, 256)


def md5_uuid(col: Column) -> Column:
    """md5 digest reshaped into UUID format, as utils.ts:10-15 does."""
    m = F.md5(col)
    return F.concat_ws(
        "-",
        F.substring(m, 1, 8),
        F.substring(m, 9, 4),
        F.substring(m, 13, 4),
        F.substring(m, 17, 4),
        F.substring(m, 21, 12),
    )
