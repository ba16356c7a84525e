"""sf0.01 oracle parity for the two r20 stamp-window overflow queries.

The r20 dedup.py reopen invalidated 52 stamps against the driver's 50-slot
window (COVERAGE.md r20: the r19 bpe->pipeline import chain grew the count
past the planned 49). The rotation deterministically leaves
``ann_ivf_pq_search_trained`` and ``pipe_filter_funnel`` at positions
50-51 — driver-unstamped at the final round — so the SUITE carries their
oracle parity at the driver's correctness SF (sf0.01; test_parity.py
covers all 200 at sf0.001) with the driver's own comparison discipline:
order-insensitive rows, dtype-kind-sensitive columns.
"""

from __future__ import annotations

import duckdb
import pytest

from doc2vec_spark.tables import TABLES
from tests.test_parity import _cells_equal, _dtype_kind, _normalize

SF_001 = "/root/testdata/sf0.01"

OVERFLOW = ["ann_ivf_pq_search_trained", "pipe_filter_funnel"]


@pytest.fixture(scope="module")
def duck001():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_001}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", OVERFLOW)
def test_overflow_query_parity_at_sf001(name, spark, duck001):  # noqa: F811
    from doc2vec_spark.registry import all_queries

    spec = all_queries()[name]
    assert spec.oracle is not None
    spark_pdf = spec.fn(spark, SF_001).toPandas()
    duck_pdf = duck001.sql(spec.oracle).df()

    s_rows, s_cols = _normalize(spark_pdf)
    d_rows, d_cols = _normalize(duck_pdf)
    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    for col in s_cols:
        assert _dtype_kind(spark_pdf.dtypes[col]) == _dtype_kind(
            duck_pdf.dtypes[col]
        ), f"{name}: dtype kind mismatch on {col}"
    assert len(s_rows) == len(d_rows), (
        f"{name}: rowcount {len(s_rows)} vs {len(d_rows)}"
    )
    for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
        for c, (sv, dv) in enumerate(zip(sr, dr)):
            assert _cells_equal(sv, dv), (
                f"{name}: row {i} col {s_cols[c]}: spark={sv!r} duck={dv!r}"
            )
