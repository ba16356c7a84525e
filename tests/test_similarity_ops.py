"""Behavioral invariants of the IVF-PQ operators (round 7), beyond oracle
parity: the query vector must rank first under ADC (pins LUT indexing),
and PQ codes must be deterministic and in [0, K).
"""

from __future__ import annotations


def test_ivf_pq_query_vector_is_rank_one(spark):
    """ADC distance sum_m ||q_m - c_{m,code}||^2 over a candidate's codes is
    globally minimized by the query's own code assignment (each term is the
    subspace argmin), so vec_id 0 — the query — must surface at rank 1. This
    pins the LUT indexing: an off-by-one in the code->LUT lookup would break
    it immediately."""
    from doc2vec_spark.operators.similarity import QUERIES
    from tests.conftest import SF_DIR

    rows = QUERIES["ann_ivf_pq_search"].fn(spark, SF_DIR).collect()
    assert rows and rows[0].rnk == 1 and rows[0].vec_id == 0
    assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
    assert all(rows[i].adc_dist <= rows[i + 1].adc_dist for i in range(len(rows) - 1))


def test_pq_codes_in_range_and_deterministic(spark):
    from doc2vec_spark.operators.similarity import PQ_K, PQ_M, QUERIES
    from tests.conftest import SF_DIR

    a = sorted(map(tuple, QUERIES["ann_pq_codes"].fn(spark, SF_DIR).collect()))
    b = sorted(map(tuple, QUERIES["ann_pq_codes"].fn(spark, SF_DIR).collect()))
    assert a == b and a
    for row in a[:200]:
        for code in row[1 : PQ_M + 1]:
            assert 0 <= code < PQ_K
