"""Sitemap source (SURVEY S2; reference content-processor.ts:277-319).

Parses sitemap.xml / sitemap-index XML into a (url, lastmod) DataFrame,
recursing into nested indexes. Parsing happens driver-side (sitemaps are
small); the resulting DataFrame seeds the crawler frontier and drives the
W1 lastmod-skip join.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

def _local(tag: str) -> str:
    """'{any-namespace}loc' -> 'loc'. Real-world sitemaps appear with the
    canonical sitemaps.org xmlns, an https:// variant, or none at all —
    matching on the exact namespace would silently parse all of those
    variants to zero pages, so elements are matched by LOCAL name."""
    return tag.rsplit("}", 1)[-1]


def parse_sitemap_xml(xml_text: str) -> tuple[list[tuple[str, str | None]], list[str]]:
    """-> (page entries [(url, lastmod)], nested sitemap urls)."""
    root = ET.fromstring(xml_text)
    pages: list[tuple[str, str | None]] = []
    nested: list[str] = []
    tag = _local(root.tag)
    for el in root:
        loc = None
        lastmod = None
        for child in el:
            if _local(child.tag) == "loc":
                loc = child
            elif _local(child.tag) == "lastmod":
                lastmod = child
        if loc is None or not (loc.text or "").strip():
            continue
        url = loc.text.strip()
        lm = lastmod.text.strip() if lastmod is not None and lastmod.text else None
        if tag == "sitemapindex":
            nested.append(url)
        else:
            pages.append((url, lm))
    return pages, nested


def read_sitemap(
    spark: SparkSession,
    sitemap_url: str,
    fetch: Callable[[str], str],
    max_depth: int = 5,
) -> DataFrame:
    """Fetch + recursively flatten sitemap indexes -> DataFrame(url, lastmod)."""
    pages: list[tuple[str, str | None]] = []
    frontier = [sitemap_url]
    seen: set[str] = set()
    for _ in range(max_depth):
        if not frontier:
            break
        next_frontier: list[str] = []
        for sm in frontier:
            if sm in seen:
                continue
            seen.add(sm)
            p, nested = parse_sitemap_xml(fetch(sm))
            pages.extend(p)
            next_frontier.extend(nested)
        frontier = next_frontier
    return spark.createDataFrame(pages, "url string, lastmod string")
