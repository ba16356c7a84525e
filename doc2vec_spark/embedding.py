"""Deterministic digest-arithmetic embeddings (SURVEY E1/E2).

The reference calls OpenAI/Azure with batched inputs and a 60s timeout
(doc2vec.ts:2010-2041); its own e2e tests stub the call with a constant
vector (tests/README.md:604). This engine's hermetic stand-in is stronger:
unit vectors derived from md5 digests of the text — distinct texts get
distinct, reproducible vectors, so KNN results are stable and testable
offline. A real provider drops in by replacing ``embed_texts``; the Spark
plumbing (Arrow-batched pandas UDF, truncation guard, embed-only-changed
gating in sync.py) is exactly what a production endpoint needs.

The component math is deliberately SQL-expressible so the driver's DuckDB
oracle can recompute identical vectors (CORRECTNESS hash rows for the full
chunk->embed->KNN plane, not just rows-only checks):

  comps[i] = int16(md5(text[:N] + '#' + str(i // 8)).hex[4*(i%8) : 4*(i%8)+4]) - 32768
  vec[i]   = float32(comps[i] / sqrt(sum(comps[j]^2)))

Every step is exactly reproducible across engines: the component sum of
squares is INTEGER arithmetic (64 * 32768^2 < 2^53, exact in double), and
IEEE 754 requires sqrt, division, and the float32 cast to be correctly
rounded — unlike ln/cos (libm-dependent) or Mersenne-Twister randn, which
no SQL engine can replay. See ``components_sql``/``vector_sql`` for the
DuckDB side.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

DEFAULT_DIM = 64  # fixtures use 64 (FIXTURES.md); production reference is 3072
MAX_EMBED_CHARS = 32_764  # 8191 tokens x 4 chars (doc2vec.ts:2006-2008)
_COMPS_PER_DIGEST = 8  # an md5 digest yields 8 16-bit components


def digest_components(payload: bytes, dim: int) -> list[int]:
    """``dim`` signed 16-bit integers derived from md5(payload + '#' + block)."""
    comps: list[int] = []
    for j in range((dim + _COMPS_PER_DIGEST - 1) // _COMPS_PER_DIGEST):
        d = hashlib.md5(payload + b"#" + str(j).encode("ascii")).hexdigest()
        comps.extend(
            int(d[4 * k : 4 * k + 4], 16) - 32768 for k in range(_COMPS_PER_DIGEST)
        )
    return comps[:dim]


def unit_vector(comps: list[int]) -> np.ndarray:
    """L2-normalized float32 vector from integer components — exact-integer
    norm^2, correctly-rounded sqrt/divide/float32-cast (cross-engine stable)."""
    normsq = sum(c * c for c in comps)
    if normsq == 0:
        return np.zeros(len(comps), dtype=np.float32)
    norm = math.sqrt(normsq)
    return np.array([c / norm for c in comps], dtype=np.float32)


def embed_text(text: str, dim: int = DEFAULT_DIM) -> np.ndarray:
    """One deterministic unit vector. Truncation mirrors doc2vec.ts:2017-2028."""
    truncated = (text or "")[:MAX_EMBED_CHARS]
    return unit_vector(digest_components(truncated.encode("utf-8", errors="replace"), dim))


def embed_texts(texts, dim: int = DEFAULT_DIM) -> list[np.ndarray]:
    """Batch entry point — swap in a real provider here (doc2vec.ts:2030-2041
    batches the same way)."""
    return [embed_text(t, dim) for t in texts]


def components_sql(text_expr: str, dim: int = DEFAULT_DIM, truncate: bool = True) -> str:
    """DuckDB expression: the integer component list of ``text_expr``
    (mirrors digest_components on utf-8 text)."""
    t = f"substr({text_expr}, 1, {MAX_EMBED_CHARS})" if truncate else f"({text_expr})"
    return (
        f"list_transform(range(0, {dim}), i -> "
        f"('0x' || substr(md5({t} || '#' || CAST(i // 8 AS VARCHAR)), "
        f"CAST((i % 8) * 4 + 1 AS BIGINT), 4))::BIGINT - 32768)"
    )


def vector_sql(comps_col: str) -> str:
    """DuckDB expression: float32 unit vector from an integer-component
    column (mirrors unit_vector; reference ``comps_col`` by name — it is
    expanded three times)."""
    c = comps_col
    return (
        f"CASE WHEN list_sum(list_transform({c}, x -> x*x)) = 0 "
        f"THEN list_transform({c}, x -> CAST(0.0 AS REAL)) "
        f"ELSE list_transform({c}, x -> CAST(x / sqrt(CAST("
        f"list_sum(list_transform({c}, y -> y*y)) AS DOUBLE)) AS REAL)) END"
    )


def embedding_udf(dim: int = DEFAULT_DIM):
    """Arrow-batched pandas UDF: the executor-side embedding stage."""

    @pandas_udf(T.ArrayType(T.FloatType()))
    def _embed(texts):
        import pandas as pd

        return pd.Series([embed_text(t, dim).tolist() for t in texts])

    return _embed


def with_embeddings(df, text_col: str = "content", out_col: str = "embedding", dim: int = DEFAULT_DIM):
    from doc2vec_spark.tables import ensure_shipped

    ensure_shipped(df.sparkSession)
    return df.withColumn(out_col, embedding_udf(dim)(F.col(text_col)))
