"""Cross-engine-deterministic rounding.

Native ROUND differs between engines at exact .5 boundaries (Spark rounds
the shortest-decimal representation HALF_UP via BigDecimal; DuckDB scales
and rounds the binary double) — and .5 boundaries genuinely occur, e.g. an
AVG over a power-of-two group size is exactly representable. ``pround``
defines rounding as pure IEEE arithmetic — floor(x * 10^n + 0.5) / 10^n —
which every engine evaluates bit-identically. Also maps -0.0 -> 0.0 for free.

Use pround/sql_round for every double that went through arithmetic and is
part of a hash-checked output.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def pround(col: Column | str, n: int) -> Column:
    if isinstance(col, str):
        col = F.col(col)
    s = float(10**n)
    return F.floor(col * s + F.lit(0.5)) / F.lit(s)


def sql_round(expr: str, n: int) -> str:
    s = float(10**n)
    return f"floor(({expr}) * {s} + 0.5) / {s}"


def det_avg(sum_col: Column, count_col: Column, input_decimals: int = 2) -> Column:
    """Cross-engine-deterministic average.

    A plain AVG can differ between engines by an ulp (partial-agg order), and
    when the true mean sits exactly on a rounding boundary (power-of-two group
    sizes make it exactly representable) no post-rounding can reconcile them.
    Instead: snap the sum to its true fixed-point value (inputs have
    ``input_decimals`` decimals, so sum*10^d is integer up to ~1e-9 fp dust),
    then divide by the count — a single IEEE division of exact integers,
    bit-identical everywhere.
    """
    s = float(10**input_decimals)
    return F.floor(sum_col * s + F.lit(0.5)) / (F.lit(s) * count_col)


def sql_det_avg(sum_expr: str, count_expr: str, input_decimals: int = 2) -> str:
    s = float(10**input_decimals)
    return f"floor(({sum_expr}) * {s} + 0.5) / ({s} * ({count_expr}))"
