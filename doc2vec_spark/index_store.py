"""Persisted ANN index lifecycle (VERDICT r13 #2).

The reference persists its vector index IN the store itself and rebuilds it
per sync (``database.ts:36-52`` creates the vec0 table beside the chunks;
``database.ts:89-94`` builds the Qdrant collection once and every query
probes it). Round 13's serving API only had an in-session memo keyed on the
chunk frame's plan semantic hash — a plan-identical rewrite of the
underlying files served stale centroids (documented, not enforced), and a
new session retrained from scratch.

This module closes both holes by storing the trained coarse-quantizer
centroids beside the sync watermarks:

- ``AnnIndexStore`` serializes the k x dim centroid floats into the same
  atomic-replace JSON KV the sync watermarks use (``SyncStateStore``), keyed
  by the ``ChunkStore.version_token()`` of the chunk data they were trained
  on. JSON float round-trips are exact (repr-based), so a reloaded index is
  bitwise the trained one.
- Staleness is INVALIDATION BY COMMIT, not by plan identity: every
  ``ChunkStore.apply`` bumps the manifest counter, so the token of a
  rewritten store never matches and ``load`` refuses to serve the old
  centroids — the same advance-on-success discipline the watermarks follow
  (W3/W4): an index version only becomes current when the sync that built
  it committed.
- ``ensure_chunk_ann_index`` is the build-once/probe-per-query seam: load
  if current, else train on the committed chunks and persist. A new
  SparkSession (or process) loads without retraining; a rewrite under the
  SAME logical plan retrains because the token moved.

At 100 TB the payload is still k * dim floats (tiny, driver-side); the
expensive artifact it guards — the per-row cell assignment — is persisted
as a partition/bucket column at ingest (serving.cell_assignment_col), and
this token discipline is exactly what tells a deployment when that column
must be recomputed.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame

from doc2vec_spark.store import ChunkStore, SyncStateStore

INDEX_KEY = "ann_index"


def _token_str(version_token: tuple) -> str:
    return repr(version_token)


class AnnIndexStore:
    """Trained-quantizer persistence beside the sync watermarks. One JSON
    KV entry: {"version": <store version token>, "centroids": {cell: [f]}}."""

    def __init__(self, path: str):
        self.kv = SyncStateStore(path)

    def save(self, index: dict[int, list[float]], version_token: tuple) -> None:
        payload = {
            "version": _token_str(version_token),
            "centroids": {str(c): list(v) for c, v in sorted(index.items())},
        }
        self.kv.put(INDEX_KEY, json.dumps(payload))

    def load(self, version_token: tuple) -> dict[int, list[float]] | None:
        """The persisted index, or None when absent or trained on a
        different committed version of the chunk data (stale-by-commit)."""
        raw = self.kv.get(INDEX_KEY)
        if raw is None:
            return None
        try:
            payload = json.loads(raw)
        except ValueError:
            return None
        # corrupt-reads-as-absent covers the whole payload shape, not just
        # invalid JSON (review r14): a non-object payload or a missing/
        # non-object centroids map must read as absent, never raise
        if not isinstance(payload, dict):
            return None
        if payload.get("version") != _token_str(version_token):
            return None
        cents = payload.get("centroids")
        if not isinstance(cents, dict):
            return None
        try:
            return {int(c): list(v) for c, v in cents.items()}
        except (TypeError, ValueError):
            return None

    def invalidate(self) -> None:
        self.kv.delete(INDEX_KEY)


def ensure_chunk_ann_index(
    store: ChunkStore,
    index_store: AnnIndexStore,
    chunks: DataFrame | None = None,
) -> dict[int, list[float]]:
    """Build-once / probe-per-query: return the persisted index if it was
    trained on the store's CURRENT committed version, else train on the
    committed chunks (or the caller's ``chunks`` frame over them) and
    persist under that version token. Pass the result as ``index=`` to
    serving.query_documentation_routed — the plan-hash memo is then never
    consulted, so rewrites can't serve stale centroids."""
    from doc2vec_spark.operators.serving import build_chunk_ann_index

    token = store.version_token()
    cached = index_store.load(token)
    if cached is not None:
        return cached
    index = build_chunk_ann_index(store.read() if chunks is None else chunks)
    # empty store -> empty index: return it (the routed API falls through
    # to the exact scan on a falsy index) but persist nothing — there is
    # no training to reuse, and a later non-empty sync must retrain anyway
    if not index:
        return index
    # the sync that commits DURING training moves the token; persisting the
    # fresh centroids under the PRE-training token would mispair them with
    # the old committed data (review r14 TOCTOU). Save only when the commit
    # state is unchanged; the caller still gets the index either way, and
    # the next call retrains against the new commit.
    if store.version_token() == token:
        index_store.save(index, token)
    return index
