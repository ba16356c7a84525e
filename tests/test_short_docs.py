"""Short-document guards (ADVICE r02): docs with < n tokens must not crash
the n-gram operators (F.sequence(1, size-n+1) generates a DESCENDING range
there and element_at(ws, 0) raises) and must stay hash-parity with the
DuckDB oracle (NULL dup_3gram_frac, NULL fingerprint, empty shingles).

The driver corpus has >= 10 tokens per doc, so these paths only fire on a
synthetic fixture — written here as a real parquet `documents` table so the
registry fns and their oracles run unmodified against it.
"""

from __future__ import annotations

import math

import pytest


@pytest.fixture(scope="module")
def short_dir(tmp_path_factory):
    import duckdb

    d = tmp_path_factory.mktemp("shortdocs")
    duckdb.sql(
        """
        COPY (
          SELECT * FROM (VALUES
            (0, 'one',                       'en', 'w', 3),
            (1, 'two words',                 'en', 'w', 9),
            (2, 'now three tokens',          'en', 'w', 16),
            (3, 'four whitespace tokens here','en', 'w', 28),
            (4, 'a much longer document with plenty of tokens to shingle', 'en', 'w', 56),
            (5, '',                          'en', 'w', 0)
          ) t(doc_id, text, lang, source, n_chars)
        ) TO '%s' (FORMAT PARQUET)
        """
        % (d / "documents.parquet")
    )
    return str(d)


@pytest.fixture(scope="module")
def short_duck(short_dir):
    import duckdb

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{short_dir}/documents.parquet'"
    )
    yield con
    con.close()


def _parity(spark, duck, name, fn, oracle, sf_dir):
    from tests.test_parity import _cells_equal, _normalize

    s_rows, s_cols = _normalize(fn(spark, sf_dir).toPandas())
    d_rows, d_cols = _normalize(duck.sql(oracle).df())
    assert s_cols == d_cols, f"{name}: columns {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), f"{name}: rows {len(s_rows)} vs {len(d_rows)}"
    for sr, dr in zip(s_rows, d_rows):
        for c, (sv, dv) in enumerate(zip(sr, dr)):
            assert _cells_equal(sv, dv), f"{name} col {s_cols[c]}: {sv!r} vs {dv!r}"
    return s_rows, s_cols


def test_ta_repetition_short_docs(spark, short_duck, short_dir):
    from doc2vec_spark.operators.textanalysis import QUERIES

    spec = QUERIES["ta_repetition"]
    rows, cols = _parity(spark, short_duck, "ta_repetition", spec.fn, spec.oracle, short_dir)
    by_id = {r[cols.index("doc_id")]: r for r in rows}
    frac = cols.index("dup_3gram_frac")
    # < 3 tokens -> NULL frac, no crash; >= 3 unique-gram docs -> 0.0
    assert by_id[0][frac] is None
    assert by_id[1][frac] is None
    assert by_id[5][frac] is None
    assert by_id[2][frac] == 0.0
    assert by_id[4][frac] == 0.0


def test_ta_fingerprint_short_docs(spark, short_duck, short_dir):
    from doc2vec_spark.operators.textanalysis import QUERIES

    spec = QUERIES["ta_fingerprint"]
    rows, cols = _parity(spark, short_duck, "ta_fingerprint", spec.fn, spec.oracle, short_dir)
    by_id = {r[cols.index("doc_id")]: r for r in rows}
    fp, ns = cols.index("fingerprint"), cols.index("n_shingles")
    for short_id in (0, 1, 2, 3, 5):  # < 5 tokens: NULL fingerprint, 0 shingles
        assert by_id[short_id][fp] is None and by_id[short_id][ns] == 0
    assert by_id[4][fp] is not None and by_id[4][ns] > 0


def test_word_shingles_short_docs(spark):
    from pyspark.sql import functions as F

    from doc2vec_spark.operators.dedup import word_shingles

    df = spark.createDataFrame(
        [("one",), ("two words",), ("now three tokens",), ("",)], "text string"
    ).select(word_shingles(3).alias("sh"))
    got = [r.sh for r in df.collect()]
    assert got[0] == [] and got[1] == [] and got[3] == []
    assert got[2] == ["now three tokens"]


def test_ta_pmi_collocations_short_docs(spark, short_duck, short_dir):
    """ADVICE r04: a 1-token doc used to make sequence(0, size-2) emit
    [0, -1] and l[-1] raise under ANSI mode, where the oracle's range() is
    simply empty. The size >= 2 guard must keep both engines agreeing."""
    from doc2vec_spark.operators.quality import QUERIES

    spec = QUERIES["ta_pmi_collocations"]
    rows, _ = _parity(
        spark, short_duck, "ta_pmi_collocations", spec.fn, spec.oracle, short_dir
    )
    assert rows is not None  # no crash; parity asserted inside


def test_ta_gopher_rules_short_docs(spark, short_duck, short_dir):
    from doc2vec_spark.operators.quality import QUERIES

    spec = QUERIES["ta_gopher_rules"]
    rows, _ = _parity(
        spark, short_duck, "ta_gopher_rules", spec.fn, spec.oracle, short_dir
    )
    assert len(rows) > 0


def test_ta_tfidf_topk_short_docs(spark, short_duck, short_dir):
    from doc2vec_spark.operators.quality import QUERIES

    spec = QUERIES["ta_tfidf_topk"]
    rows, _ = _parity(
        spark, short_duck, "ta_tfidf_topk", spec.fn, spec.oracle, short_dir
    )
    assert len(rows) > 0
