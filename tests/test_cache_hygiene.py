"""Storage must stay flat across registry invocations (VERDICT r04 #4).

Multi-consumer intermediates are cached via caching.scoped_cache, and the
registry wrapper releases the previous invocation's caches on entry — so a
long sequence of query invocations (the driver's 50-query correctness run,
a resident engine session) must not accumulate persisted RDD storage, with
no global ``clearCache`` anywhere.
"""

from __future__ import annotations

from tests.conftest import SF_DIR

# Queries whose implementations cache multi-consumer intermediates.
CACHING_QUERIES = [
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "dedup_incremental_check",
    "dedup_semdedup",
    "ta_distinctive_tokens",
    "ta_unigram_lm_score",
    # r20: the shared train/apply candidate table moved from the
    # _PARKED_APPLY_CACHE module global into the scoped discipline
    "ta_bpe_apply",
]


def _persisted_count(spark):
    return len(spark.sparkContext._jsc.getPersistentRDDs())


def test_registry_invocations_do_not_accumulate_storage(spark):
    from doc2vec_spark.caching import release_scoped_caches
    from doc2vec_spark.registry import all_queries

    qs = all_queries()
    release_scoped_caches()
    base = _persisted_count(spark)

    # two full passes over every caching query: a leak grows storage by
    # pass 2; scoped caches keep at most ONE invocation's blocks live
    for _ in range(2):
        for name in CACHING_QUERIES:
            qs[name].fn(spark, SF_DIR).count()

    after = _persisted_count(spark)
    # the last invocation's own caches may still be live (released only at
    # the NEXT invocation); anything beyond that is a leak
    assert after <= base + 2, (
        f"persisted RDDs grew {base} -> {after} across two registry passes; "
        "an operator is caching without scoped_cache"
    )

    release_scoped_caches()
    assert _persisted_count(spark) <= base


def test_scoped_cache_release_is_idempotent(spark):
    from doc2vec_spark.caching import release_scoped_caches, scoped_cache

    df = scoped_cache(spark.range(10))
    assert df.count() == 10
    release_scoped_caches()
    release_scoped_caches()  # second release is a no-op, never raises
