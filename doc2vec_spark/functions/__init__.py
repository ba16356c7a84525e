"""Scalar / vector column-expression library (SURVEY.md section 2.8).

Everything here is built from native ``pyspark.sql.functions`` so it stays
inside WholeStageCodegen — no Python UDFs on the hot path.
"""

from doc2vec_spark.functions.hashing import md5_uuid, sha256_hex
from doc2vec_spark.functions.text import token_count_regex, token_count_ws, truncate_chars
from doc2vec_spark.functions.urls import has_extension, normalize_url, url_prefix
from doc2vec_spark.functions.vectors import as_double_array, cosine_distance, dot, l2_norm

__all__ = [
    "sha256_hex",
    "md5_uuid",
    "normalize_url",
    "url_prefix",
    "has_extension",
    "token_count_ws",
    "token_count_regex",
    "truncate_chars",
    "cosine_distance",
    "dot",
    "l2_norm",
    "as_double_array",
]
