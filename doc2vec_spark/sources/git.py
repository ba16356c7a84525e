"""Git-based incremental code source (S8/W6; reference doc2vec.ts:1353-1513).

The reference shallow-clones, records HEAD, and on later runs diffs
``old_sha..HEAD`` with ``--name-status`` to build changed/deleted file sets
that gate the scan (J2 semi-join) and the cleanup (J1 anti-join). Git runs
driver-side (it is per-repo metadata work); the resulting small DataFrames
broadcast into the executor-side scans.
"""

from __future__ import annotations

import subprocess

from pyspark.sql import DataFrame, SparkSession


def _git(repo_dir: str, *args: str) -> str:
    return subprocess.run(
        ["git", "-C", repo_dir, *args],
        check=True,
        capture_output=True,
        text=True,
    ).stdout


def clone_shallow(url: str, dest: str, branch: str = "main") -> None:
    """git clone --depth 1 (doc2vec.ts:1466-1479)."""
    subprocess.run(
        ["git", "clone", "--depth", "1", "--branch", branch, url, dest],
        check=True,
        capture_output=True,
        text=True,
    )


def head_sha(repo_dir: str) -> str:
    return _git(repo_dir, "rev-parse", "HEAD").strip()


def diff_name_status(repo_dir: str, old_sha: str, new_sha: str = "HEAD") -> list[tuple[str, str, str | None]]:
    """-> [(status, path, new_path)] from ``git diff --name-status old..new``
    (doc2vec.ts:1353-1437). Status letters: A/M/D and Rxx renames."""
    out = _git(repo_dir, "diff", "--name-status", f"{old_sha}..{new_sha}")
    rows: list[tuple[str, str, str | None]] = []
    for line in out.splitlines():
        parts = line.split("\t")
        if not parts or not parts[0]:
            continue
        status = parts[0]
        if status.startswith("R") and len(parts) >= 3:
            rows.append(("R", parts[1], parts[2]))
        elif len(parts) >= 2:
            rows.append((status[0], parts[1], None))
    return rows


def incremental_file_sets(
    spark: SparkSession, repo_dir: str, old_sha: str, new_sha: str = "HEAD"
) -> tuple[DataFrame, DataFrame]:
    """-> (changed_files, deleted_files) DataFrames.

    A/M -> changed; D -> deleted; R -> old path deleted + new path changed
    (doc2vec.ts:1415-1433). Empty diff -> empty frames (schema stable).
    """
    rows = diff_name_status(repo_dir, old_sha, new_sha)
    changed: list[tuple[str]] = []
    deleted: list[tuple[str]] = []
    for status, path, new_path in rows:
        if status in ("A", "M"):
            changed.append((path,))
        elif status == "D":
            deleted.append((path,))
        elif status == "R":
            deleted.append((path,))
            if new_path:
                changed.append((new_path,))
    schema = "path string"
    return (
        spark.createDataFrame(changed, schema),
        spark.createDataFrame(deleted, schema),
    )
