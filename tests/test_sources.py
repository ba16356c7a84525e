"""Hermetic source-connector tests: local/code directories on tmpfs, fake
transports for REST/sitemap/crawler."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest


# -- S5/S6 local + code ------------------------------------------------------


def test_read_local_directory(spark, tmp_path):
    from doc2vec_spark.sources.local import read_local_directory

    (tmp_path / "docs").mkdir()
    (tmp_path / "docs" / "a.md").write_text("# A\ncontent a")
    (tmp_path / "docs" / "sub").mkdir()
    (tmp_path / "docs" / "sub" / "b.md").write_text("# B\ncontent b")
    (tmp_path / "docs" / "skip.bin").write_bytes(b"\x00\x01")
    (tmp_path / "docs" / "huge.md").write_text("x" * 5000)

    df = read_local_directory(
        spark, str(tmp_path / "docs"), include_extensions=[".md"], max_size_chars=4000
    )
    rows = {r["url"].rsplit("/", 1)[-1]: r for r in df.collect()}
    assert set(rows) == {"a.md", "b.md"}  # bin excluded, huge guarded (P6)
    assert rows["a.md"]["markdown"] == "# A\ncontent a"
    assert rows["a.md"]["mtime"] is not None


def test_read_code_directory_mtime_and_allowlist(spark, tmp_path):
    from doc2vec_spark.sources.local import read_code_directory

    d = tmp_path / "repo"
    d.mkdir()
    (d / "x.py").write_text("def f():\n    return 1\n")
    (d / "y.ts").write_text("export const y = 2;\n")
    (d / "z.txt").write_text("not code")

    df = read_code_directory(spark, str(d), repo="o/r", branch="main")
    got = {r["path"].rsplit("/", 1)[-1]: r["language"] for r in df.collect()}
    assert got == {"x.py": "python", "y.ts": "typescript"}

    allowed = spark.createDataFrame([(str(d / "x.py"),)], "path string")
    df2 = read_code_directory(spark, str(d), allowed_files=allowed)
    assert [r["path"].rsplit("/", 1)[-1] for r in df2.collect()] == ["x.py"]

    future = datetime(2100, 1, 1)
    assert read_code_directory(spark, str(d), mtime_cutoff=future).count() == 0  # W5


# -- S7 github cursor pagination --------------------------------------------


def test_github_cursor_pagination(spark):
    from doc2vec_spark.sources.rest import github_issues, parse_next_link

    assert parse_next_link('<https://api.x/p2>; rel="next", <https://api.x/p9>; rel="last"') == "https://api.x/p2"
    assert parse_next_link(None) is None

    pages = {
        0: ([{"id": 1, "title": "a", "state": "open", "body": "", "updated_at": "t"}],
            {"Link": '<page:1>; rel="next"'}),
        1: ([{"id": 2, "title": "b", "state": "closed", "body": "", "updated_at": "t"}], {}),
    }
    calls = []

    def fetch(url):
        idx = 1 if url == "page:1" else 0
        calls.append(url)
        return pages[idx]

    df = github_issues(spark, fetch, "o/r", since="2024-01-01T00:00:00Z")
    assert sorted(r["id"] for r in df.collect()) == [1, 2]
    assert "since=2024-01-01" in calls[0]  # watermark pushed into the API


# -- S9 zendesk window bisection --------------------------------------------


def test_zendesk_bisection_under_cap(spark):
    from doc2vec_spark.sources.rest import SEARCH_CAP, zendesk_window_fetch

    # 2500 tickets uniformly over 4h: any window >=2h hits the cap -> bisect
    start = datetime(2024, 1, 1)
    end = start + timedelta(hours=4)
    total = 2500

    def count_in(s, e):
        return int(total * (e - s) / (end - start))

    fetched_windows = []

    def fetch_window(s, e):
        fetched_windows.append((s, e))
        return [{"id": i} for i in range(count_in(s, e))]

    items = zendesk_window_fetch(count_in, fetch_window, start, end)
    assert len(items) == sum(len([0] * count_in(s, e)) for s, e in fetched_windows)
    assert all(count_in(s, e) < SEARCH_CAP for s, e in fetched_windows)
    assert len(fetched_windows) == 4  # 4h split into 4 x 1h windows of 625


# -- S2 sitemap --------------------------------------------------------------


SITEMAP_INDEX = """<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://d/sm1.xml</loc></sitemap>
</sitemapindex>"""

SITEMAP_1 = """<?xml version="1.0"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://d/a</loc><lastmod>2024-01-01</lastmod></url>
  <url><loc>https://d/b</loc></url>
</urlset>"""


def test_sitemap_recursion(spark):
    from doc2vec_spark.sources.sitemap import read_sitemap

    fetch = {"https://d/sitemap.xml": SITEMAP_INDEX, "https://d/sm1.xml": SITEMAP_1}
    df = read_sitemap(spark, "https://d/sitemap.xml", fetch.__getitem__)
    rows = {r["url"]: r["lastmod"] for r in df.collect()}
    assert rows == {"https://d/a": "2024-01-01", "https://d/b": None}


# -- S1 crawler BFS ----------------------------------------------------------


SITE = {
    "https://d/": ('home <a href="https://d/a">a</a> <a href="https://d/b">b</a>',
                   ["https://d/a", "https://d/b"]),
    "https://d/a": ("page a", ["https://d/b", "https://other/x"]),
    "https://d/b": ("page b", ["https://d/"]),  # cycle
}


def test_crawler_bfs_visits_each_page_once(spark):
    from doc2vec_spark.sources.crawler import crawl

    def make_fetcher():
        def fetch(url):
            md, links = SITE.get(url, ("", []))
            return md, links, url in SITE
        return fetch

    df = crawl(spark, ["https://d/"], make_fetcher, url_prefix="https://d/")
    rows = df.collect()
    urls = [r["url"] for r in rows]
    assert sorted(urls) == sorted(set(urls)) == ["https://d/", "https://d/a", "https://d/b"]
    assert all(r["ok"] for r in rows)  # off-site link never fetched


def test_extract_links_resolves_relative():
    from doc2vec_spark.sources.crawler import extract_links

    html = '<a href="/abs">x</a> <a href="rel/page">y</a> <a href="#frag">z</a>'
    got = extract_links(html, "https://d/dir/index.html")
    assert got == ["https://d/abs", "https://d/dir/rel/page"]


# -- S10 zendesk articles ----------------------------------------------------


def test_zendesk_articles_client_side_filter(spark):
    from doc2vec_spark.sources.rest import zendesk_articles

    pages = {
        "p1": (
            [
                {"id": 1, "title": "old", "body": "", "updated_at": "2023-01-01T00:00:00Z"},
                {"id": 2, "title": "new", "body": "", "updated_at": "2024-06-01T00:00:00Z"},
            ],
            {"Link": '<p2>; rel="next"'},
        ),
        "p2": (
            [{"id": 3, "title": "newer", "body": "", "updated_at": "2024-07-01T00:00:00Z"}],
            {},
        ),
    }

    def fetch(url):
        return pages["p2"] if url == "p2" else pages["p1"]

    df = zendesk_articles(spark, fetch, "https://z.example", updated_since="2024-01-01T00:00:00Z")
    assert sorted(r["id"] for r in df.collect()) == [2, 3]  # old filtered client-side
    assert zendesk_articles(spark, fetch, "https://z.example").count() == 3
