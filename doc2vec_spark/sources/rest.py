"""Paginated REST source layer (SURVEY S7/S9/S10; reference doc2vec.ts:258-439,
1540-1913).

Transport is injected (``fetch(url) -> (payload, headers)``) so every
pagination/windowing strategy is hermetically testable and the network layer
is swappable. The fetched pages land in ``spark.createDataFrame`` — for the
catalogs these APIs serve (1e4-1e6 items), driver-side fetch + distribute is
the right shape; the heavy work (chunk/embed) happens on executors.

Ported semantics:
- RFC 5988 ``Link: rel=next`` cursor walking (utils.ts:101-108) — GitHub
  rejects deep page offsets, so cursors must be followed verbatim.
- ``since=`` incremental watermark pushdown (doc2vec.ts:277-278).
- Zendesk date-window bisection: a window returning the 1000-result cap is
  split in half recursively until complete (doc2vec.ts:1739-1776).
"""

from __future__ import annotations

import re
from collections.abc import Callable
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession

Fetch = Callable[[str], tuple[list[dict], dict[str, str]]]

_NEXT_LINK_RE = re.compile(r'<([^>]+)>\s*;\s*rel\s*=\s*"?next"?', re.IGNORECASE)


def parse_next_link(link_header: str | None) -> str | None:
    """utils.ts:101-108."""
    if not link_header:
        return None
    for part in link_header.split(","):
        m = _NEXT_LINK_RE.search(part)
        if m:
            return m.group(1).strip()
    return None


def fetch_paginated(fetch: Fetch, first_url: str, max_pages: int = 10_000) -> list[dict]:
    """Follow rel=next cursors until exhausted (doc2vec.ts:371-417)."""
    items: list[dict] = []
    url: str | None = first_url
    for _ in range(max_pages):
        if not url:
            break
        payload, headers = fetch(url)
        items.extend(payload)
        url = parse_next_link(headers.get("link") or headers.get("Link"))
    return items


def github_issues(
    spark: SparkSession,
    fetch: Fetch,
    repo: str,
    since: str | None = None,
    schema: str = "id long, title string, state string, body string, updated_at string",
) -> DataFrame:
    """S7: issues since the watermark, cursor-paginated (doc2vec.ts:258-439)."""
    url = f"https://api.github.com/repos/{repo}/issues?state=all&per_page=100"
    if since:
        url += f"&since={since}"  # W4 watermark pushdown into the API
    items = fetch_paginated(fetch, url)
    return spark.createDataFrame(items, schema) if items else spark.createDataFrame([], schema)


SEARCH_CAP = 1000  # Zendesk search API hard cap (doc2vec.ts:1741)


def zendesk_window_fetch(
    count_in_window: Callable[[datetime, datetime], int],
    fetch_window: Callable[[datetime, datetime], list[dict]],
    start: datetime,
    end: datetime,
    min_window: timedelta = timedelta(minutes=1),
) -> list[dict]:
    """S9 date-window bisection (doc2vec.ts:1739-1776): a window that hits
    the 1000-result cap is split in half recursively; windows below
    ``min_window`` are fetched as-is (the cap cannot be avoided)."""
    n = count_in_window(start, end)
    if n < SEARCH_CAP or (end - start) <= min_window:
        return fetch_window(start, end)
    mid = start + (end - start) / 2
    return zendesk_window_fetch(
        count_in_window, fetch_window, start, mid, min_window
    ) + zendesk_window_fetch(count_in_window, fetch_window, mid, end, min_window)


def zendesk_articles(
    spark: SparkSession,
    fetch: Fetch,
    base_url: str,
    updated_since: str | None = None,
    schema: str = "id long, title string, body string, updated_at string",
) -> DataFrame:
    """S10 (doc2vec.ts:1791-1913): help-center article pagination with the
    reference's CLIENT-side ``updated_at >= start`` incremental filter (the
    articles endpoint has no server-side since param)."""
    items = fetch_paginated(fetch, f"{base_url}/api/v2/help_center/articles?per_page=100")
    if updated_since is not None:
        items = [a for a in items if a.get("updated_at", "") >= updated_since]
    return spark.createDataFrame(items, schema) if items else spark.createDataFrame([], schema)


def zendesk_tickets(
    spark: SparkSession,
    count_in_window: Callable[[datetime, datetime], int],
    fetch_window: Callable[[datetime, datetime], list[dict]],
    start: datetime,
    end: datetime,
    schema: str = "id long, subject string, status string, updated_at string, organization_id long",
) -> DataFrame:
    items = zendesk_window_fetch(count_in_window, fetch_window, start, end)
    return spark.createDataFrame(items, schema) if items else spark.createDataFrame([], schema)
