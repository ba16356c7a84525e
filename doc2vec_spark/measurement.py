"""Corpus size measurement + partition calibration (leaf module, r21).

Extracted from dedup.py per VERDICT r20 #6 ("when dedup.py next
legitimately reopens, extract the measurement helpers to a leaf module"):
dedup.py reopened this round for the signature-reuse optimization, so the
move costs nothing extra, and future calibration tweaks stop reopening the
entire dedup plane. dedup.py / pipeline.py re-export these names for their
historical call sites; new callers (textrank's loop router) import from
here. Logic is unchanged — the docstrings carry their original round
provenance.
"""

from __future__ import annotations

import os

# Calibration of the size-scaled posting partition count: ~150 KB of
# documents parquet per partition (single-sourced; dedup.py/pipeline.py
# re-export it — keep ONE definition).
POSTING_BYTES_PER_PARTITION = 150 << 10


def corpus_parquet_bytes(sf_dir: str, table: str = "documents") -> int | None:
    """On-disk byte size of the table's parquet, or None when it cannot be
    measured (non-local scheme, unreadable path). Local metadata only — free.

    Directory layouts fold per part file RECURSIVELY (os.walk): store.py's
    standard write shape is NESTED — partitionBy('bucket','product_name')
    produces bucket=K/product_name=X/part-*.parquet subdirectories, and a
    one-level listdir sums the ~4096-byte subdirectory inodes instead of
    the data (ADVICE r19 #1: the same silent mis-measure ADVICE r18 #1
    flagged for the bare getsize, one level down). Dot/underscore entries
    (_SUCCESS, .part-*.crc, _delta_log) are pruned at every level, dirs and
    files alike. Single-file layouts stat once. Callers must treat None as
    UNMEASURABLE, never as small, so unknown corpora keep the 100 TB path
    (size scaling via the session default floor, AQE skew handling)."""

    def _raise(err: OSError):
        # os.walk SWALLOWS scandir errors by default (onerror=None), which
        # would return 0 — "measured tiny" — for a directory the process
        # cannot traverse. Re-raising routes every traversal error to the
        # except below: unreadable stays UNMEASURABLE, never small.
        raise err

    path = os.path.join(sf_dir, f"{table}.parquet")
    try:
        if os.path.isdir(path):
            total = 0
            for root, dirs, files in os.walk(path, onerror=_raise):
                dirs[:] = [d for d in dirs if not d.startswith((".", "_"))]
                for fname in files:
                    if fname.startswith((".", "_")):
                        continue
                    total += os.path.getsize(os.path.join(root, fname))
            return total
        return os.path.getsize(path)
    except (OSError, ValueError, TypeError):
        return None


def corpus_agg_partitions(sf_dir: str, table: str = "documents") -> int:
    """Shuffle-partition count for corpus-shingle posting aggregates,
    scaled to the table's on-disk parquet size via corpus_parquet_bytes
    (directory-aware since r20; non-file schemes fall back to the session
    default, which keeps AQE's runtime re-planning — callers only
    repartition ABOVE the default).

    Why (r18, caught by the 32x containment rehearsal): a collect_set/list
    posting groupBy over a grown corpus at the FIXED session default packs
    millions of array buffers into each reduce task — at 32x documents the
    posting build took 8.0 s at 32 partitions vs 2.85 s pre-partitioned by
    the group key at the size-scaled count (fewer groups per task, and the
    exchange moves raw rows instead of per-group partial array buffers).
    Callers only repartition when the computed count EXCEEDS the session
    default, so small corpora keep AQE's post-shuffle coalescing exactly as
    before. ~150 KB of documents parquet per partition calibrates to the
    measured comfortable group load; the 32x-default ceiling keeps the
    count bounded on a single host while a real cluster's larger default
    scales the ceiling with it."""
    from doc2vec_spark.session import default_parallelism

    n = default_parallelism()
    size = corpus_parquet_bytes(sf_dir, table)
    if size is None:
        return n
    return int(max(n, min(32 * n, size // POSTING_BYTES_PER_PARTITION + 1)))


def small_corpus(sf_dir: str, table: str = "documents") -> bool:
    """True when the table is MEASURED small enough that the size-scaled
    posting partition count stays at the session default — the signal the
    iterative entry points (CC loops, textrank) use to widen their
    static-plan (AQE-off) scope over the build itself (r18): below the
    threshold every exchange is tiny, runtime re-planning has nothing to
    re-plan, and each AQE materialization job is pure scheduler floor.
    At scale the count exceeds the default and the build keeps AQE's skew
    handling and coalescing exactly as before.

    Fail-safe (ADVICE r18): an UNMEASURABLE corpus (non-local scheme,
    unreadable path) is NOT small."""
    from doc2vec_spark.session import default_parallelism

    size = corpus_parquet_bytes(sf_dir, table)
    if size is None:
        return False
    return size // POSTING_BYTES_PER_PARTITION + 1 <= default_parallelism()
