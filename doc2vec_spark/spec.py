"""QuerySpec: one named engine capability = a Spark plan + a DuckDB oracle.

Every operator claimed in SURVEY.md section 2 is registered as a QuerySpec.
``fn(spark, sf_dir)`` returns the DataFrame; ``oracle`` is ANSI SQL DuckDB
runs on the same parquet tables (views pre-registered by the driver).
``oracle=None`` marks genuinely non-SQL-expressible ops (driver then does a
rows-only check).

Column-name discipline: every computed column is aliased identically on both
sides — the driver sorts columns by name before value-hashing.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
