"""Checkpoint-block hygiene (VERDICT r03 #2): iterative algorithms must not
grow the set of persistent RDDs across invocations — a long-lived driver
calling connected_components per batch would otherwise leak one checkpoint
per round per call (observed as bench reps degrading 2.8s -> 14.9s)."""

from __future__ import annotations

import pytest

from doc2vec_spark.operators.pipeline import (
    connected_components,
    connected_components_star,
    free_cc_checkpoints,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "u long, v long")


def _n_persistent(spark) -> int:
    return len(
        spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    )


# a graph deep enough to force several checkpointed rounds
_DEEP = [(i, i + 1) for i in range(1, 40)] + [(100, 101), (101, 102)]


@pytest.mark.parametrize("cc", [connected_components, connected_components_star])
def test_cc_no_persistent_rdd_growth_across_calls(spark, cc):
    free_cc_checkpoints()
    base = _n_persistent(spark)

    r1 = cc(_edges(spark, _DEEP))
    assert r1.count() > 0
    after_first = _n_persistent(spark)
    # within one invocation only the final round's checkpoint survives; the
    # (several) superseded rounds were freed as they were replaced
    assert after_first - base <= 2

    r2 = cc(_edges(spark, _DEEP))
    assert r2.count() > 0
    after_second = _n_persistent(spark)
    # back-to-back calls: the second frees the first's parked blocks on
    # entry, so the steady state does not grow
    assert after_second <= after_first

    free_cc_checkpoints()
    assert _n_persistent(spark) <= base


def test_cc_result_survives_until_next_invocation(spark):
    free_cc_checkpoints()
    r1 = connected_components(_edges(spark, [(1, 2), (2, 3)]))
    # the parked blocks must stay alive while the result is still consumed
    assert {tuple(r) for r in r1.collect()} == {(1, 1), (2, 1), (3, 1)}
    r2 = connected_components(_edges(spark, [(7, 8)]))
    assert r2.count() == 2
    free_cc_checkpoints()


def test_crawler_frees_wave_checkpoints(spark):
    from doc2vec_spark.sources.crawler import crawl

    pages = {
        "https://ex.test/a": ("A", ["https://ex.test/b"], True),
        "https://ex.test/b": ("B", ["https://ex.test/c"], True),
        "https://ex.test/c": ("C", [], True),
    }

    def make_fetcher():
        return lambda url: pages.get(url, ("", [], False))

    base = _n_persistent(spark)
    out = crawl(spark, ["https://ex.test/a"], make_fetcher, "https://ex.test/")
    assert out.count() == 3
    # one fetched checkpoint per wave stays parked (results reference them);
    # all visited-set snapshots are freed
    first_growth = _n_persistent(spark) - base

    out2 = crawl(spark, ["https://ex.test/a"], make_fetcher, "https://ex.test/")
    assert out2.count() == 3
    growth = _n_persistent(spark) - base
    assert growth <= first_growth  # steady state: no per-crawl accumulation

    from doc2vec_spark.checkpoints import free_parked

    free_parked("crawl")
    assert _n_persistent(spark) <= base
