"""Round-9 operator tests: shard-manifest empty-corpus guard (ADVICE r8),
wordpiece tokenizer APPLY, MMR diversified rerank, and the batched-round
connected-components job cut."""

from __future__ import annotations

import duckdb
import pytest


def _write_docs(d, rows):
    """rows: (doc_id, text, lang, source, n_chars)"""
    d.mkdir(parents=True, exist_ok=True)
    if rows:
        vals = ", ".join("(%d, '%s', '%s', '%s', %d)" % r for r in rows)
        duckdb.sql(
            "COPY (SELECT * FROM (VALUES %s) "
            "t(doc_id, text, lang, source, n_chars)) TO '%s' (FORMAT PARQUET)"
            % (vals, d / "documents.parquet")
        )
    else:
        duckdb.sql(
            "COPY (SELECT * FROM (SELECT 0 AS doc_id, 'x' AS \"text\", "
            "'en' AS lang, 's' AS source, 1 AS n_chars) WHERE 1=0) "
            "TO '%s' (FORMAT PARQUET)" % (d / "documents.parquet")
        )


def test_shard_manifest_empty_corpus_yields_empty_manifest(spark, tmp_path):
    """ADVICE r8: bit_xor over zero shard rows is NULL; the operator must
    return the empty manifest the oracle returns, not crash on int(None)."""
    from doc2vec_spark.operators.manifest import QUERIES

    d = tmp_path / "empty"
    _write_docs(d, [])
    spec = QUERIES["pipe_shard_manifest"]
    got = spec.fn(spark, str(d))
    assert got.count() == 0
    assert [f.name for f in got.schema.fields] == [
        "shard", "n_docs", "n_tokens", "fp_xor", "corpus_fp",
    ]
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
    assert con.sql(spec.oracle).fetchall() == []
