"""Checkpoint-block hygiene for iterative algorithms.

``DataFrame.localCheckpoint()`` pins its blocks in executor storage and
PySpark exposes no per-DataFrame free, so an iterative algorithm that
checkpoints every round leaks one RDD's worth of blocks per round per
invocation — on a long-lived 100 TB driver that is unbounded storage growth
(observed: consecutive ``connected_components`` bench reps degraded
2.8 s -> 14.9 s from exactly this).

``ckpt_tracked`` diffs the context's persistent-RDD map around the
checkpoint call to capture py4j handles to the newly pinned blocks.
Superseded rounds are freed immediately with ``free_blocks``; a FINAL
result's blocks (still referenced by the returned frame — unpersisting a
local checkpoint makes it unrecoverable, lineage is truncated) are parked
with ``park_blocks`` and freed lazily at the next algorithm entry via
``free_parked`` — the same defer-one-generation discipline ``store.py``
uses for bucket GC. Consequence: such a result is valid until the next
invocation of the same family; consume or persist it first (every registry
caller does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# family -> parked py4j block handles from the previous invocation
_PARKED: dict[str, list] = {}


def ckpt_tracked(df: DataFrame) -> tuple[DataFrame, list]:
    """``df.localCheckpoint()`` plus py4j handles to the blocks it pinned.

    Detection is a before/after diff of the context's persistent-RDD map;
    the driver is single-threaded through these algorithms, so the only new
    entries are this checkpoint's. Handles support ``.unpersist(blocking)``.
    """
    sc = df.sparkSession.sparkContext
    before = {int(k) for k in sc._jsc.getPersistentRDDs().keySet().toArray()}
    out = df.localCheckpoint()  # eager: blocks are materialized on return
    after = sc._jsc.getPersistentRDDs()
    handles = [
        after.get(k) for k in after.keySet().toArray() if int(k) not in before
    ]
    return out, handles


def free_blocks(handles: list) -> None:
    """Unpersist checkpoint blocks that no live frame references anymore."""
    for handle in handles:
        try:
            handle.unpersist(False)
        except Exception:  # session already stopped — nothing to free
            pass


def park_blocks(family: str, handles: list) -> None:
    """Defer freeing a final result's blocks to the next ``free_parked``."""
    _PARKED.setdefault(family, []).extend(handles)


def free_parked(family: str) -> None:
    """Free blocks parked by the previous invocation of ``family``."""
    free_blocks(_PARKED.pop(family, []))
