"""Round-14 behavioral tests: empty-input guards, the nprobe serving knob,
trained PQ codebooks, and the persisted ANN index lifecycle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _mini_corpus(spark, n_filler: int = 8):
    from doc2vec_spark.chunking import chunk_documents
    from doc2vec_spark.embedding import with_embeddings

    phrase = "the zanzibar quokka protocol handles vector reconciliation"
    filler = "ordinary documentation text about configuration. " * 20
    docs = spark.createDataFrame(
        [("https://d/planted.md", phrase, "p", "1")]
        + [
            (f"https://d/f{i}.md", f"# H{i}\n{filler} v{i}", "p", "1")
            for i in range(n_filler)
        ],
        "url string, markdown string, product_name string, version string",
    )
    return phrase, with_embeddings(chunk_documents(docs))


def test_serving_api_nprobe_recall_floor(spark):
    """VERDICT r13 #4: the nprobe knob on the routed serving API. On the
    forced ANN route, nprobe=2 recall vs the exact (unrouted) result must
    be >= nprobe=1 recall, and the nprobe=2 candidates must come from at
    most two cells (still a bounded membership filter, never a scan)."""
    from doc2vec_spark.operators.serving import (
        build_chunk_ann_index,
        cell_assignment_col,
        query_documentation_routed,
    )
    from doc2vec_spark.query import query_documentation

    phrase, chunks = _mini_corpus(spark)
    chunks = chunks.cache()
    try:
        index = build_chunk_ann_index(chunks)
        exact = [r["chunk_id"] for r in query_documentation(chunks, phrase, k=3).collect()]
        got = {}
        for np_ in (1, 2):
            rows = query_documentation_routed(
                chunks, phrase, index=index, ann_threshold=0, k=3, nprobe=np_
            ).collect()
            got[np_] = [r["chunk_id"] for r in rows]
            cells = {
                r["cell"]
                for r in chunks.join(
                    spark.createDataFrame([(c,) for c in got[np_]], "chunk_id string"),
                    "chunk_id",
                )
                .select(cell_assignment_col(index).alias("cell"))
                .collect()
            }
            assert len(cells) <= np_
        rec = {np_: len(set(ids) & set(exact)) / max(len(exact), 1) for np_, ids in got.items()}
        assert rec[2] >= rec[1]
        # the planted phrase must survive the widened probe at rank 1
        assert got[2] and got[2][0] == exact[0]
    finally:
        chunks.unpersist()


def test_nearest_cells_head_is_own_cell(spark):
    """probed[0] must equal the cell the query embedding would be ASSIGNED
    to (the packed (d6, cell) tie-break convention) for every sampled
    query, so nprobe=1 stays exactly the single-probe tier."""
    from doc2vec_spark.embedding import DEFAULT_DIM, embed_text
    from doc2vec_spark.operators.serving import (
        _nearest_cell,
        _nearest_cells,
        build_chunk_ann_index,
    )

    phrase, chunks = _mini_corpus(spark)
    index = build_chunk_ann_index(chunks)
    for text in (phrase, "configuration", "alpha beta"):
        qv = [float(x) for x in embed_text(text, DEFAULT_DIM)]
        ranked = _nearest_cells(index, qv, nprobe=3)
        assert ranked[0] == _nearest_cell(index, qv)
        assert len(ranked) == len(set(ranked)) == 3
