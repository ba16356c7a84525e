"""Round 22 (optimization round 2) focused tests.

Pins the internals that r22 optimizations / correctness fixes changed:
- coreset.dataset_fingerprint now recurses into nested directory layouts
  (VERDICT r20 #1 / r21 #5: the one-level fold missed in-place rewrites of
  part files two levels down, so _TRAIN_MEMO/_FPS_MEMO could serve stale
  artifacts after a same-path data rewrite).
"""

from __future__ import annotations

import os

import pytest

from doc2vec_spark.operators.coreset import dataset_fingerprint


def _write(p, data: bytes) -> None:
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, "wb") as f:
        f.write(data)


def test_fingerprint_sees_nested_in_place_rewrite(tmp_path):
    """store.py's partitionBy shape nests part files two levels down; an
    in-place rewrite there must change the fingerprint even though the
    top-level dir and the bucket=K subdir keep their mtimes."""
    root = tmp_path / "embeddings.parquet"
    part = root / "bucket=0" / "product_name=x" / "part-000.parquet"
    _write(str(part), b"v1-bytes")
    _write(str(root / "bucket=0" / "_SUCCESS"), b"")  # pruned at every level
    os.utime(part, ns=(1_000_000_000, 1_000_000_000))
    fp1 = dataset_fingerprint(str(tmp_path))
    assert fp1 and fp1 == dataset_fingerprint(str(tmp_path))
    # same-size in-place rewrite: only the nested file's mtime moves; pin
    # the ancestor dirs' mtimes to prove the fold no longer depends on them
    dir_ns = (2_000_000_000, 2_000_000_000)
    for d in (root, root / "bucket=0", root / "bucket=0" / "product_name=x"):
        os.utime(d, ns=dir_ns)
    fp_dirs_pinned = dataset_fingerprint(str(tmp_path))
    _write(str(part), b"v2-bytes")
    os.utime(part, ns=(3_000_000_000, 3_000_000_000))
    for d in (root, root / "bucket=0", root / "bucket=0" / "product_name=x"):
        os.utime(d, ns=dir_ns)
    fp2 = dataset_fingerprint(str(tmp_path))
    assert fp2 != fp_dirs_pinned
    # and the relpath component distinguishes same-stat files in different
    # subdirectories (a pure (mtime,size) multiset fold would alias them)
    assert all(isinstance(e[0], str) and "part-000" in e[0] for e in (fp2[-1],))


def test_fingerprint_single_file_and_missing(tmp_path):
    f = tmp_path / "embeddings.parquet"
    f.write_bytes(b"abc")
    st = os.stat(f)
    assert dataset_fingerprint(str(tmp_path)) == (st.st_mtime_ns, st.st_size)
    assert dataset_fingerprint(str(tmp_path / "nope")) == ()


def test_diff_status_count_shape_matches_list_semantics(spark):
    """The r22 count-equality diff_status must reproduce the r21
    collect_list+full-outer-join semantics exactly, including the NULL-hash
    edges: collect_list DROPS NULLs, so a NULL hash asserts side presence
    but never counts toward the multiset comparison."""
    from doc2vec_spark.sync import diff_status

    new = spark.createDataFrame(
        [
            ("u_unchanged", "a"), ("u_unchanged", "a"), ("u_unchanged", "b"),
            ("u_updated_count", "a"), ("u_updated_count", "a"),
            ("u_updated_val", "a"),
            ("u_new", "z"),
            ("u_null_both", None), ("u_null_both", "a"),
            ("u_null_presence_new", None),
            ("u_null_extra_new", "a"), ("u_null_extra_new", None),
        ],
        "url string, hash string",
    )
    old = spark.createDataFrame(
        [
            ("u_unchanged", "a"), ("u_unchanged", "b"), ("u_unchanged", "a"),
            ("u_updated_count", "a"),
            ("u_updated_val", "b"),
            ("u_deleted", "q"),
            ("u_null_both", "a"), ("u_null_both", None), ("u_null_both", None),
            ("u_null_presence_old", None),
            ("u_null_extra_new", "a"),
        ],
        "url string, hash string",
    )
    got = {r["url"]: r["status"] for r in diff_status(new, old).collect()}
    assert got == {
        "u_unchanged": "unchanged",  # same multiset, different arrival order
        "u_updated_count": "updated",  # [a,a] vs [a]: count mismatch
        "u_updated_val": "updated",
        "u_new": "new",
        "u_deleted": "deleted",
        # [a] vs [a] after NULL elision -> unchanged (old had 2 NULLs, new 1)
        "u_null_both": "unchanged",
        # a url whose ONLY row has a NULL hash still exists on that side:
        # collect_list gives an EMPTY (not NULL) list -> presence
        "u_null_presence_new": "new",
        "u_null_presence_old": "deleted",
        # [a] vs [a] after elision even though new carried an extra NULL row
        "u_null_extra_new": "unchanged",
    }
