"""Pre-validation of every registry (Spark, DuckDB-oracle) pair at sf0.001.

Mirrors the driver's correctness gate: order-insensitive comparison after
sorting columns by name. Floats must match exactly after the in-query
rounding both sides apply — if a pair only matches approximately, that is a
bug in the query spec (fix the rounding), so this test fails on it.
"""

from __future__ import annotations

import math

import pytest

from tests.conftest import SF_DIR


def _normalize(df):
    """pandas DataFrame -> column-name-sorted, row-sorted list of tuples."""
    import pandas as pd

    df = df.reindex(sorted(df.columns), axis=1)

    def norm_cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return None
        if isinstance(v, float):
            return float(v)
        if hasattr(v, "item"):  # numpy scalar
            v = v.item()
        if isinstance(v, pd.Timestamp):
            return v.isoformat()
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return tuple(norm_cell(x) for x in v)
        return v

    rows = [tuple(norm_cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r)), list(df.columns)


def _cells_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        return a == b or (math.isnan(a) and math.isnan(b))
    # int vs float numeric equivalence (engines may differ on count() width)
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return float(a) == float(b)
    return a == b


def queries_with_oracles():
    from doc2vec_spark.registry import all_queries

    return [(n, s) for n, s in sorted(all_queries().items()) if s.oracle is not None]


def _dtype_kind(dtype):
    """Collapse numpy dtype to the kind the driver's hash distinguishes.

    The driver hashes pandas values dtype-sensitively: int64 vs float64
    differ even when every cell is numerically equal (DuckDB SUM(int) ->
    HUGEINT -> float64 while Spark yields int64). Signedness and width do
    not matter to it, so i/u collapse together.
    """
    k = dtype.kind
    return "i" if k in "iu" else k


@pytest.mark.parametrize("name,spec", queries_with_oracles(), ids=lambda p: p if isinstance(p, str) else "")
def test_oracle_parity(name, spec, spark, duck):
    spark_pdf = spec.fn(spark, SF_DIR).toPandas()
    duck_pdf = duck.sql(spec.oracle).df()

    s_rows, s_cols = _normalize(spark_pdf)
    d_rows, d_cols = _normalize(duck_pdf)

    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    for col in s_cols:
        sk = _dtype_kind(spark_pdf.dtypes[col])
        dk = _dtype_kind(duck_pdf.dtypes[col])
        assert sk == dk, (
            f"{name}: column {col} dtype kind spark={spark_pdf.dtypes[col]} "
            f"duck={duck_pdf.dtypes[col]} — the driver hash is "
            f"dtype-sensitive; CAST the oracle (usually SUM -> BIGINT)"
        )
    assert len(s_rows) == len(d_rows), f"{name}: rowcount {len(s_rows)} vs {len(d_rows)}"
    for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
        for c, (sv, dv) in enumerate(zip(sr, dr)):
            assert _cells_equal(sv, dv), (
                f"{name}: row {i} col {s_cols[c]}: spark={sv!r} duck={dv!r}"
            )


def test_rows_only_queries_run(spark):
    from doc2vec_spark.registry import all_queries

    for name, spec in sorted(all_queries().items()):
        if spec.oracle is None:
            n = spec.fn(spark, SF_DIR).count()
            assert n >= 0, name
