"""Driver-simulation oracle check (the r21/r22 methodology, now a script).

Runs every registered (query, oracle) pair at a chosen SF in a VANILLA
SparkSession (no repo session tuning — results must not depend on it) and
compares against DuckDB with the same order-insensitive, exact-float rules
as tests/test_parity.py / the driver's gate. Prints per-query mismatches
and a final `MISMATCHES:` line.

Usage: python3 scripts/verify_sim.py [--sf-dir /root/testdata/sf0.01] [--only a,b]
"""

from __future__ import annotations

import argparse
import math
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _normalize(df):
    import pandas as pd

    df = df.reindex(sorted(df.columns), axis=1)

    def norm_cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return None
        if isinstance(v, float):
            return float(v)
        if hasattr(v, "item"):
            v = v.item()
        if isinstance(v, pd.Timestamp):
            return v.isoformat()
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return tuple(norm_cell(x) for x in v)
        return v

    rows = [
        tuple(norm_cell(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    ]
    return (
        sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r)),
        list(df.columns),
    )


def _cells_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        return a == b or (math.isnan(a) and math.isnan(b))
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return float(a) == float(b)
    return a == b


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    from doc2vec_spark.registry import all_queries
    from doc2vec_spark.tables import TABLES

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("doc2vec-verify-sim")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'"
        )

    registry = all_queries()
    names = sorted(n for n, s in registry.items() if s.oracle is not None)
    if args.only:
        names = [n for n in args.only.split(",") if n in registry]

    mismatches: list[str] = []
    for name in names:
        spec = registry[name]
        try:
            s_pdf = spec.fn(spark, args.sf_dir).toPandas()
            d_pdf = con.sql(spec.oracle).df()
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            mismatches.append(name)
            print(f"{name}: ERROR {e}")
            continue
        s_rows, s_cols = _normalize(s_pdf)
        d_rows, d_cols = _normalize(d_pdf)
        bad = None
        if s_cols != d_cols:
            bad = f"columns {s_cols} vs {d_cols}"
        elif len(s_rows) != len(d_rows):
            bad = f"rows {len(s_rows)} vs {len(d_rows)}"
        else:
            for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
                if not all(_cells_equal(a, b) for a, b in zip(sr, dr)):
                    bad = f"row {i}: {sr!r} vs {dr!r}"
                    break
        if bad:
            mismatches.append(name)
            print(f"{name}: MISMATCH {bad}")
        spark.catalog.clearCache()

    print(f"checked: {len(names)}")
    print(f"MISMATCHES: {', '.join(mismatches) if mismatches else 'none'}")
    return 1 if mismatches else 0


if __name__ == "__main__":
    sys.exit(main())
