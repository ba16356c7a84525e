"""Round-15 behavioral tests: the domain/embedding_native degenerate
guards (VERDICT r14 "What's missing" #1 — empty tenant / missing probe doc
must return first-class empty results, mcp/src/server.ts:100-107) and the
hybrid-oracle shape assertion. The unigram broadcast rewrite is covered by
the registry parity harness (test_parity.py at two SFs pins the hash) and
the broadcast-plan assertion in test_round16_ops.py; PQ-codebook
persistence tests live in test_round16_ops.py beside the store API they
exercise (ADVICE r15).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def empty_docs_dir(tmp_path_factory):
    """documents with the driver schema and zero rows (fresh-tenant shape)."""
    d = tmp_path_factory.mktemp("sf_empty_docs")
    schema = pq.read_schema(f"{SF_DIR}/documents.parquet")
    pq.write_table(
        pa.table({f.name: pa.array([], f.type) for f in schema}, schema=schema),
        str(d / "documents.parquet"),
    )
    return str(d)


@pytest.fixture(scope="module")
def noprobe_docs_dir(tmp_path_factory):
    """documents verbatim EXCEPT the doc_id 0/7 probe rows (the sweep's
    --mode noprobe shape): corpus non-empty, query anchor missing."""
    d = tmp_path_factory.mktemp("sf_noprobe_docs")
    tbl = pq.read_table(f"{SF_DIR}/documents.parquet")
    tbl = tbl.filter(~pc.is_in(pc.field("doc_id"), value_set=pa.array([0, 7])))
    assert tbl.num_rows > 0
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d)


KNN_COLS = ["url", "chunk_id", "chunk_index", "distance"]


@pytest.mark.parametrize(
    "qname,cols",
    [
        ("doc_knn_query_documentation", KNN_COLS),
        ("doc_knn_query_native", KNN_COLS),
        ("doc_hybrid_search_rrf", ["doc_id", "rank_kw", "rank_vec", "rrf_score"]),
    ],
)
def test_missing_probe_doc_returns_declared_empty(spark, noprobe_docs_dir, qname, cols):
    """A corpus without the probe document must yield the oracle's 0 rows
    (its query CTE is empty), not a NoneType crash at the bounded first()."""
    from doc2vec_spark.registry import all_queries

    out = all_queries()[qname].fn(spark, noprobe_docs_dir)
    assert out.columns == cols
    assert out.count() == 0


@pytest.mark.parametrize(
    "qname,cols",
    [
        ("doc_knn_query_documentation", KNN_COLS),
        ("doc_knn_query_native", KNN_COLS),
        ("doc_hybrid_search_rrf", ["doc_id", "rank_kw", "rank_vec", "rrf_score"]),
        (
            "doc_bm25_topk",
            ["doc_id", "tf_query", "tf_join", "tf_dup", "tf_spark", "bm25"],
        ),
    ],
)
def test_empty_corpus_returns_declared_empty(spark, empty_docs_dir, qname, cols):
    """Fresh-tenant (zero-row documents) shape for the whole domain plane,
    including bm25's n=0 stats row (sl is NULL, avgdl would divide by 0)."""
    from doc2vec_spark.registry import all_queries

    out = all_queries()[qname].fn(spark, empty_docs_dir)
    assert out.columns == cols
    assert out.count() == 0


def test_hybrid_oracle_q_is_cte_not_scalar_subquery():
    """The rrf oracle's probe tokens must come from a 0-or-1-row CTE (so a
    missing probe doc empties every downstream CTE); a scalar subquery
    would instead fuse NULL token lists into 20 rows of NULL ranks."""
    from doc2vec_spark.registry import all_queries

    sql = all_queries()["doc_hybrid_search_rrf"].oracle
    assert "FROM documents WHERE doc_id = 7" in sql
    # the old shape applied array_to_string to an inline scalar subquery,
    # which yields a NULL-token one-row q even when the probe doc is gone
    assert "array_to_string((SELECT" not in sql
