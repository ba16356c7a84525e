"""Round-10 tests: SRP sign-margin proof (ADVICE r9 dedup.py:1180)."""

from __future__ import annotations

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# SRP banding sign margins (ADVICE r9, dedup.py:1180)
# ---------------------------------------------------------------------------


def _seq_fold_dots(vm: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Sequential left-fold dot products in float64 — bit-exact emulation of
    DuckDB's list_dot_product accumulation order: acc = (((p1) + p2) + p3)...
    Iterating the dim axis and accumulating elementwise reproduces the
    scalar fold's IEEE operation order for every (vector, plane) cell."""
    acc = np.zeros((vm.shape[0], planes.shape[0]), dtype=np.float64)
    for i in range(vm.shape[1]):
        acc += vm[:, i : i + 1] * planes[None, :, i]
    return acc


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_srp_sign_margins_dominate_summation_order_error(spark, sf):
    """ADVICE r9 (dedup.py:1180): the engine signs 192-plane projections via
    a BLAS matmul while the oracle folds sequentially; a near-zero
    projection could in principle flip sign between the two accumulation
    orders. Prove it cannot on the corpora the driver hashes: over the FULL
    LSH corpus (embeddings + planted clones) and ALL THREE plane tiers
    (16 / 64 / 192 planes), (a) the BLAS signs equal the sequential-fold
    signs cell-for-cell, and (b) the smallest |projection| exceeds the
    worst-case difference between ANY two per-op-rounded summation orders
    of the 64 products — bound 2*(n-1)*eps*sum|v_i*p_i| — by >= 10^3, so
    no reordering (BLAS blocking, FMA, pairwise) can flip any band bit."""
    from doc2vec_spark.operators.dedup import (
        PAIR_PLANES,
        W2_PLANES,
        WIDE_PAIR_PLANES,
        _lsh_corpus,
    )

    vm = np.array(
        [r["v"] for r in _lsh_corpus(spark, sf).select("v").collect()],
        dtype=np.float64,
    )
    eps = np.finfo(np.float64).eps
    for tier, planes in (
        ("16", PAIR_PLANES),
        ("64", WIDE_PAIR_PLANES),
        ("192", W2_PLANES),
    ):
        p = np.asarray(planes, dtype=np.float64)
        blas = vm @ p.T
        fold = _seq_fold_dots(vm, p)
        assert ((blas > 0) == (fold > 0)).all(), f"tier {tier}: sign mismatch"
        # worst-case |order_a - order_b| for recursive summation of the
        # same 64 products, any association: each order errs <=
        # (n-1)*eps*sum|products| from the exact value
        bound = 2 * (vm.shape[1] - 1) * eps * (np.abs(vm) @ np.abs(p).T)
        # ADVICE r10: an all-zero embedding row would make bound 0 and the
        # margin nan/inf — fail that degenerate corpus with a clear message
        # instead of a numpy warning
        assert bound.min() > 0, (
            f"tier {tier}: corpus contains an all-zero embedding row — "
            "sign-margin analysis undefined"
        )
        margin = np.abs(fold) / bound
        assert margin.min() >= 1e3, (
            f"tier {tier}: min sign margin {margin.min():.1f}x the "
            f"summation-order bound — banding not provably engine-exact"
        )
