"""Directory-layout dedup-plane rehearsal (VERDICT r19 #2, round 20).

The r18/r19 rehearsals proved the dedup plane linear through the top decade
on SINGLE-FILE corpora. The r20 fix made dedup.corpus_agg_partitions measure
DIRECTORY corpora (store.py's nested partitionBy('bucket','product_name')
layout) instead of reading the ~4096-byte dir inode — this script is the
end-to-end proof on that layout:

  1. build .scale{N}/ replicas (make_scale10.py) if absent;
  2. rewrite documents through store.py's exact write shape
     (partitionBy('bucket','product_name') -> bucket=K/product_name=X/
     part-*.parquet) into .scale{N}dir/;
  3. show the measurement: the pre-r20 dir-inode getsize vs the recursive
     part-file fold, and the resulting posting partition counts (must
     EXCEED the session default at 10x+ for size scaling to engage);
  4. time the containment/ngram/minhash posting builds on the directory
     corpora and cross-check row counts against the single-file runs.

Usage:
    python scripts/rehearsal_dircorpus.py [factor ...]   # default: 10 32

Output: one markdown table + one JSON line per factor (paste into
COVERAGE.md r20). Wall numbers are min-of-2 per query (the ledger pattern
of the r18 rehearsal).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

QUERIES = ["dedup_containment", "dedup_ngram_jaccard", "dedup_minhash_lsh"]
REPS = 2


def _ensure_scale(factor: int) -> Path:
    src = REPO / f".scale{factor}"
    if not (src / "documents.parquet").exists():
        subprocess.run(
            [sys.executable, str(REPO / "scripts" / "make_scale10.py"), str(factor)],
            check=True,
        )
    return src


def _dir_inode_size(path: Path) -> int:
    """What the pre-r20 single-getsize measurement saw for a directory."""
    return os.path.getsize(path)


def _ensure_dir_layout(spark, factor: int) -> Path:
    """Rewrite .scale{N}/documents.parquet through store.py's standard
    nested write shape; copy the other tables through as single files."""
    src = _ensure_scale(factor)
    dst = REPO / f".scale{factor}dir"
    marker = dst / "documents.parquet" / "_SUCCESS"
    if not marker.exists():
        if dst.exists():
            shutil.rmtree(dst)
        dst.mkdir()
        from pyspark.sql import functions as F

        (
            spark.read.parquet(str(src / "documents.parquet"))
            # store.py's exact layout: two partition levels, so the naive
            # one-level listdir fold (ADVICE r19 #1) also mis-measures it
            .withColumn("bucket", F.pmod(F.col("doc_id"), F.lit(8)))
            .withColumn("product_name", F.col("source"))
            .write.partitionBy("bucket", "product_name")
            .mode("overwrite")
            .parquet(str(dst / "documents.parquet"))
        )
        for t in ("embeddings", "events"):
            f = src / f"{t}.parquet"
            if f.is_file():
                shutil.copy(f, dst / f"{t}.parquet")
    return dst


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [10, 32]

    from doc2vec_spark.operators.dedup import (
        POSTING_BYTES_PER_PARTITION,
        corpus_agg_partitions,
        corpus_parquet_bytes,
    )
    from doc2vec_spark.registry import merged_queries
    from doc2vec_spark.session import default_parallelism, get_spark

    spark = get_spark("rehearsal-dircorpus")
    merged = merged_queries()
    n_default = default_parallelism()

    print(f"session default parallelism: {n_default}")
    print(
        "| factor | layout | measured bytes | pre-r20 getsize | posting parts "
        "| " + " | ".join(QUERIES) + " | rows |"
    )
    print("|---" * (6 + len(QUERIES)) + "|")

    for factor in factors:
        flat = _ensure_scale(factor)
        dirc = _ensure_dir_layout(spark, factor)
        rows_by_layout: dict[str, list[int]] = {}
        rec: dict = {"factor": factor, "layouts": {}}
        for label, sf in (("file", flat), ("dir", dirc)):
            size = corpus_parquet_bytes(str(sf))
            parts = corpus_agg_partitions(str(sf))
            pre = _dir_inode_size(sf / "documents.parquet")
            walls, counts = [], []
            for q in QUERIES:
                best = None
                for _ in range(REPS):
                    t0 = time.monotonic()
                    n = merged[q].fn(spark, str(sf)).count()
                    dt = time.monotonic() - t0
                    best = dt if best is None else min(best, dt)
                walls.append(best)
                counts.append(n)
            rows_by_layout[label] = counts
            rec["layouts"][label] = {
                "bytes": size,
                "pre_r20_getsize": pre,
                "posting_partitions": parts,
                "walls": dict(zip(QUERIES, [round(w, 2) for w in walls])),
                "rows": dict(zip(QUERIES, counts)),
            }
            print(
                f"| {factor}x | {label} | {size:,} | {pre:,} | {parts} | "
                + " | ".join(f"{w:.2f}s" for w in walls)
                + " | "
                + "/".join(str(c) for c in counts)
                + " |"
            )
        # the invariants this rehearsal exists to prove
        dl = rec["layouts"]["dir"]
        assert dl["posting_partitions"] > n_default, (
            f"{factor}x dir corpus did NOT engage size scaling: "
            f"{dl['posting_partitions']} <= default {n_default}"
        )
        assert dl["bytes"] // POSTING_BYTES_PER_PARTITION > 0
        assert rows_by_layout["file"] == rows_by_layout["dir"], (
            f"{factor}x row counts diverge between layouts: {rows_by_layout}"
        )
        print(json.dumps(rec))

    spark.stop()


if __name__ == "__main__":
    main()
