"""Physical-plan assertions — the scale contract, checkable at any SF.

A query that is correct at sf0.01 but full-scans/sorts at 100 TB is wrong;
these helpers let tests pin the plan properties that make a query survive a
1000x scale-up: filters pushed to the parquet scan, pruned read schemas,
broadcast (not shuffle) joins for dims, top-k via TakeOrderedAndProject
instead of a global sort.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    plan = formatted_plan(df)
    lines = [line for line in plan.splitlines() if "PushedFilters" in line]
    assert any(fragment in line for line in lines), (
        f"filter {fragment!r} not pushed to scan; PushedFilters lines: {lines}"
    )


def assert_read_schema_excludes(df: DataFrame, column: str) -> None:
    plan = formatted_plan(df)
    lines = [line for line in plan.splitlines() if "ReadSchema" in line]
    assert lines and all(column not in line for line in lines), (
        f"column {column!r} not pruned from scan: {lines}"
    )


def assert_broadcast_join(df: DataFrame) -> None:
    assert "BroadcastHashJoin" in formatted_plan(df), "expected a broadcast join"


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the physical plan (broadcast
    exchanges excluded): the scale-dominant cost a plan pays."""
    import re

    plan = formatted_plan(df)
    # operator-detail headers ("(5) Exchange") — the tree section would
    # double-count every node
    return len(re.findall(r"^\(\d+\) Exchange\b", plan, flags=re.MULTILINE))


def assert_no_cross_join(df: DataFrame) -> None:
    plan = formatted_plan(df)
    for op in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        assert op not in plan, f"{op} in plan — unbounded pair blow-up at scale"


def assert_top_k(df: DataFrame) -> None:
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan, "expected TakeOrderedAndProject top-k"
    assert "Sort [" not in plan.split("TakeOrderedAndProject")[0], (
        "global sort found above the top-k"
    )
