"""S8 git incremental + W1/W2 watermark-layer tests (hermetic: real temp git
repo, injected state)."""

from __future__ import annotations

import subprocess

import pytest


def _run(cwd, *args):
    subprocess.run(args, cwd=cwd, check=True, capture_output=True, text=True)


@pytest.fixture()
def git_repo(tmp_path):
    d = tmp_path / "repo"
    d.mkdir()
    _run(d, "git", "init", "-q")
    _run(d, "git", "config", "user.email", "t@t")
    _run(d, "git", "config", "user.name", "t")
    (d / "a.py").write_text("a = 1\n")
    (d / "b.py").write_text("b = 1\n")
    (d / "c.py").write_text("c = 1\n")
    _run(d, "git", "add", ".")
    _run(d, "git", "commit", "-qm", "one")
    return d


def test_incremental_file_sets(spark, git_repo):
    from doc2vec_spark.sources.git import head_sha, incremental_file_sets

    old = head_sha(str(git_repo))
    (git_repo / "a.py").write_text("a = 2\n")  # M
    (git_repo / "d.py").write_text("d = 1\n")  # A
    (git_repo / "b.py").unlink()  # D
    _run(git_repo, "git", "mv", "c.py", "c2.py")  # R
    _run(git_repo, "git", "add", "-A")
    _run(git_repo, "git", "commit", "-qm", "two")

    changed, deleted = incremental_file_sets(spark, str(git_repo), old)
    assert sorted(r["path"] for r in changed.collect()) == ["a.py", "c2.py", "d.py"]
    assert sorted(r["path"] for r in deleted.collect()) == ["b.py", "c.py"]


def test_incremental_no_changes(spark, git_repo):
    from doc2vec_spark.sources.git import head_sha, incremental_file_sets

    sha = head_sha(str(git_repo))
    changed, deleted = incremental_file_sets(spark, str(git_repo), sha)
    assert changed.count() == 0 and deleted.count() == 0


def test_plan_fetches_lastmod_skip(spark, tmp_path):
    from doc2vec_spark.store import SyncStateStore
    from doc2vec_spark.watermarks import plan_fetches, record_success

    state = SyncStateStore(str(tmp_path / "s.json"))
    pages = spark.createDataFrame(
        [
            ("https://d/a", "2024-01-01"),
            ("https://d/b", "2024-02-01"),
            ("https://d/c", None),
            ("https://d/new", "2024-01-01"),
        ],
        "url string, lastmod string",
    )
    # dirty state (no sync_complete): everything fetches (W8)
    state.put("lastmod:https://d/a", "2024-01-01")
    plan = {r["url"]: r["action"] for r in plan_fetches(spark, pages, state, "https://d/").collect()}
    assert set(plan.values()) == {"fetch"}

    # successful sync recorded: unchanged lastmod now skips (W1)
    record_success(
        state,
        [("https://d/a", "2024-01-01"), ("https://d/b", "2024-01-15"), ("https://d/c", None)],
        "https://d/",
    )
    plan = {r["url"]: r["action"] for r in plan_fetches(spark, pages, state, "https://d/").collect()}
    assert plan == {
        "https://d/a": "skip",     # same lastmod
        "https://d/b": "fetch",    # lastmod moved
        "https://d/c": "fetch",    # no lastmod -> etag/content layers
        "https://d/new": "fetch",  # unseen url
    }


def test_adaptive_backoff_sequence():
    from doc2vec_spark.watermarks import AdaptiveBackoff

    b = AdaptiveBackoff()
    assert b.delay_ms == 0
    assert b.on_failure() == 200
    assert b.on_failure() == 400
    assert b.on_failure() == 800
    for _ in range(10):
        b.on_failure()
    assert b.delay_ms == 5000  # capped
    assert b.on_success() == 2500  # halve on success
    for _ in range(20):
        b.on_success()
    assert b.delay_ms == 0  # decayed below the 10ms floor -> snaps to 0
    b3 = AdaptiveBackoff()
    b3.delay_ms = 19
    assert b3.on_success() == 0  # 19 // 2 = 9 < floor -> 0, not clamped to 10
    b2 = AdaptiveBackoff()
    assert b2.on_success() == 0  # never engaged -> stays 0


def test_parse_retry_after():
    from datetime import datetime, timezone

    from doc2vec_spark.watermarks import parse_retry_after

    assert parse_retry_after("30") == 30.0
    assert parse_retry_after("1.5") == 1.5  # decimals accepted (Number() semantics)
    assert parse_retry_after("0") == 1.0  # 1-second minimum clamp
    assert parse_retry_after("-5") == 1.0
    assert parse_retry_after("inf") is None  # non-finite -> unparseable
    assert parse_retry_after(None) is None
    assert parse_retry_after("garbage") is None
    now = datetime(2024, 1, 1, 12, 0, 0, tzinfo=timezone.utc)
    assert parse_retry_after("Mon, 01 Jan 2024 12:00:45 GMT", now=now) == 45.0
    assert parse_retry_after("Mon, 01 Jan 2024 11:00:00 GMT", now=now) == 1.0  # past -> 1s floor
