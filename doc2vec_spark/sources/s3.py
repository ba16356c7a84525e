"""S3 object source with per-object user-metadata resolution (S11).

The reference lists a bucket, fetches each object, and resolves config
fields written as ``metadata(x-amz-meta-foo)`` against the object's S3 user
metadata (doc2vec.ts:1111-1118: the prefix is stripped because the AWS SDK
returns user-metadata keys without ``x-amz-meta-``; a missing key resolves
to the empty string).

Spark-first shape:

- the object *bytes* come from the binaryFile reader (same scan as the
  local-directory source — S3A paths work unchanged on a real cluster);
- the user metadata comes from one ``HEAD Object`` call per key executed
  INSIDE ``mapInPandas`` — the calls fan out across executors with the rows
  they describe, so a 10^9-object bucket never funnels through the driver.
  A ``client_factory`` indirection keeps the stage hermetic in tests (a
  stub dict-backed client) and lazy on executors (boto3 clients are not
  picklable; each task builds its own).
"""

from __future__ import annotations

import re
from collections.abc import Callable
from urllib.parse import urlparse

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_METADATA_PATTERN = re.compile(r"^metadata\((.+)\)$")


def resolve_metadata_value(config_value: str, s3_metadata: dict[str, str]) -> str:
    """``metadata(x-amz-meta-product)`` -> s3_metadata['product'] ('' if
    absent); any other value passes through verbatim (doc2vec.ts:1111-1118)."""
    m = _METADATA_PATTERN.match(config_value or "")
    if not m:
        return config_value
    lookup_key = re.sub(r"^x-amz-meta-", "", m.group(1))
    return s3_metadata.get(lookup_key, "")


def parse_s3_path(path: str) -> tuple[str, str]:
    """s3://bucket/key (also s3a://) -> (bucket, key)."""
    u = urlparse(path)
    if u.scheme in ("s3", "s3a", "s3n"):
        return u.netloc, u.path.lstrip("/")
    return "", path.lstrip("/")


def default_client_factory():
    import boto3  # baked into the container; import-gated for portability

    return boto3.client("s3")


def with_s3_user_metadata(
    df: DataFrame,
    client_factory: Callable[[], object] = default_client_factory,
    path_col: str = "path",
) -> DataFrame:
    """Append ``s3_metadata: map<string,string>`` resolved by HEAD Object.

    One client per task, one HEAD per key, executed on the executor that
    owns the row — the metadata join is free of any driver-side loop."""
    from doc2vec_spark.tables import ensure_shipped

    ensure_shipped(df.sparkSession)
    out_schema = T.StructType(
        df.schema.fields
        + [T.StructField("s3_metadata", T.MapType(T.StringType(), T.StringType()))]
    )
    cols = [f.name for f in df.schema.fields]

    def fetch(batches):
        client = client_factory()
        for pdf in batches:
            metas = []
            for p in pdf[path_col]:
                bucket, key = parse_s3_path(str(p))
                try:
                    head = client.head_object(Bucket=bucket, Key=key)
                    metas.append(dict(head.get("Metadata") or {}))
                except Exception:
                    # per-object fallback only: a failed/denied HEAD resolves
                    # to empty metadata, the same as the reference's
                    # missing-key -> '' rule (doc2vec.ts:1111-1118). The url
                    # column preserves real s3a:// addresses verbatim
                    # (sources/local.py::_url_col), so this branch is the
                    # per-object exception, not a silent bucket-wide default.
                    metas.append({})
            pdf = pdf.copy()
            pdf["s3_metadata"] = metas
            yield pdf

    return df.select(*cols).mapInPandas(fetch, out_schema)


def resolved_field(config_value: str, metadata_col: str = "s3_metadata") -> F.Column:
    """Column form of resolve_metadata_value: static config values become
    literals (no per-row work); ``metadata(...)`` values read the map."""
    m = _METADATA_PATTERN.match(config_value or "")
    if not m:
        return F.lit(config_value)
    lookup_key = re.sub(r"^x-amz-meta-", "", m.group(1))
    return F.coalesce(F.col(metadata_col).getItem(lookup_key), F.lit(""))


def read_s3_objects(
    spark,
    path: str,
    config_fields: dict[str, str] | None = None,
    include_extensions: list[str] | None = None,
    client_factory: Callable[[], object] = default_client_factory,
) -> DataFrame:
    """S11 end-to-end: binaryFile scan -> HEAD-metadata stage -> config-field
    resolution. ``config_fields`` maps output columns to config values that
    may use the ``metadata(...)`` syntax (e.g. ``{"product_name":
    "metadata(x-amz-meta-product)"}``)."""
    from doc2vec_spark.sources.local import read_local_directory

    base = read_local_directory(spark, path, include_extensions=include_extensions)
    # the url column carries the object address (file:// locally, s3:// on a
    # deployment); HEAD requests parse bucket/key out of it per row
    enriched = with_s3_user_metadata(base, client_factory=client_factory, path_col="url")
    for name, value in (config_fields or {}).items():
        enriched = enriched.withColumn(name, resolved_field(value))
    return enriched
