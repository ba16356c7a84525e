"""Deterministic hash-seeded embeddings (SURVEY E1/E2).

The reference calls OpenAI/Azure with batched inputs and a 60s timeout
(doc2vec.ts:2010-2041); its own e2e tests stub the call with a constant
vector (tests/README.md:604). This engine's hermetic stand-in is stronger:
a seeded projection of sha256(text) into R^dim, L2-normalized — distinct
texts get distinct, reproducible unit vectors, so KNN results are stable and
testable offline. A real provider drops in by replacing ``embed_texts``;
the Spark plumbing (Arrow-batched pandas UDF, truncation guard, embed-only-
changed gating in sync.py) is exactly what a production endpoint needs.
"""

from __future__ import annotations

import hashlib

import numpy as np

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

DEFAULT_DIM = 64  # fixtures use 64 (FIXTURES.md); production reference is 3072
MAX_EMBED_CHARS = 32_764  # 8191 tokens x 4 chars (doc2vec.ts:2006-2008)


def embed_text(text: str, dim: int = DEFAULT_DIM) -> np.ndarray:
    """One deterministic unit vector. Truncation mirrors doc2vec.ts:2017-2028."""
    truncated = (text or "")[:MAX_EMBED_CHARS]
    digest = hashlib.sha256(truncated.encode("utf-8", errors="replace")).digest()
    seed = int.from_bytes(digest[:4], "big")
    rng = np.random.RandomState(seed)
    v = rng.randn(dim)
    norm = float(np.linalg.norm(v))
    return (v / norm if norm else v).astype(np.float32)


def embed_texts(texts, dim: int = DEFAULT_DIM) -> list[np.ndarray]:
    """Batch entry point — swap in a real provider here (doc2vec.ts:2030-2041
    batches the same way)."""
    return [embed_text(t, dim) for t in texts]


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
