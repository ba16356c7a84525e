"""Central query registry: assembles QuerySpecs from all operator modules.

``__spark_entry__.py`` exposes this to the driver; tests/test_parity.py
pre-validates every (spark, oracle) pair against DuckDB locally before the
driver's correctness gate runs.
"""

from __future__ import annotations

from doc2vec_spark.spec import QuerySpec


def all_queries() -> dict[str, QuerySpec]:
    # imports deferred so a broken module surfaces per-import, and so the
    # driver's lightweight entry import stays cheap
    from doc2vec_spark.operators import analytics, relational

    modules = [relational, analytics]
    try:
        from doc2vec_spark.operators import dedup

        modules.append(dedup)
    except ImportError:
        pass
    try:
        from doc2vec_spark.operators import textanalysis

        modules.append(textanalysis)
    except ImportError:
        pass
    try:
        from doc2vec_spark.operators import similarity

        modules.append(similarity)
    except ImportError:
        pass
    try:
        from doc2vec_spark.operators import windows

        modules.append(windows)
    except ImportError:
        pass
    try:
        from doc2vec_spark.operators import domain

        modules.append(domain)
    except ImportError:
        pass
    try:
        from doc2vec_spark.operators import extensions

        modules.append(extensions)
    except ImportError:
        pass
    try:
        from doc2vec_spark.operators import reference_parity

        modules.append(reference_parity)
    except ImportError:
        pass
    try:
        from doc2vec_spark.operators import asof

        modules.append(asof)
    except ImportError:
        pass

    merged: dict[str, QuerySpec] = {}
    for mod in modules:
        for name, spec in mod.QUERIES.items():
            if name in merged:
                raise ValueError(f"duplicate query name {name!r}")
            merged[name] = spec
    return merged
