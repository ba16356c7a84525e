"""Bounded driver-side result frames as VALUES LocalRelations (r22 batch 6).

``spark.createDataFrame(rows)`` plans a Python-RDD scan
(``applySchemaToPythonRDD``): every action on the returned frame
round-trips through a spawned Python worker — measured ~0.4 s per action
slower than a parsed VALUES LocalRelation for an 8-row frame on local[32].
For the bounded INTEGER-ONLY result tails (the zipf OLS row, the AMS
sketch rows, the HLL register table, the shard manifest) the VALUES form
is exact: every cell is ``CAST(<int literal> AS <type>)`` or
``CAST(NULL AS <type>)``, so the resulting schema and values are
literal-identical to the createDataFrame they replace. Strings/floats are
deliberately rejected — their SQL-literal round-trip is not trivially
exact, and no caller needs them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_SQL_TYPES = {"long": "BIGINT", "int": "INT"}


def int_local_frame(
    spark: SparkSession, rows: list[tuple], schema: str
) -> DataFrame:
    """``rows`` of int/None cells + a '"name type, ..."' schema (types from
    ``_SQL_TYPES``) -> a LocalTableScan frame. Rows must be non-empty —
    empty-corpus branches keep their createDataFrame([], schema) form
    (never on a timed path)."""
    if not rows:
        raise ValueError("int_local_frame needs >= 1 row; use createDataFrame([])")
    fields = [tuple(c.strip().split()) for c in schema.split(",")]
    names = [n for n, _ in fields]
    tps = [_SQL_TYPES[t] for _, t in fields]

    def cell(v, tp: str) -> str:
        if v is None:
            return f"CAST(NULL AS {tp})"
        if isinstance(v, bool) or not isinstance(v, int):
            raise TypeError(f"int_local_frame cell must be int/None, got {v!r}")
        return f"CAST({v} AS {tp})"

    vals = ", ".join(
        "(" + ", ".join(cell(v, tp) for v, tp in zip(r, tps)) + ")" for r in rows
    )
    return spark.sql(
        f"SELECT * FROM (VALUES {vals}) AS t({', '.join(names)})"
    )
