"""Website crawler as an iterative DataFrame BFS (SURVEY S1; reference
content-processor.ts:321-933).

The reference runs a serial queue + visited-set loop in one process with a
headless browser. Spark-first, each BFS *wave* is a distributed job:

    frontier_df --mapInPandas fetch--> (url, markdown, links)
    visited    |= frontier
    frontier'   = explode(links) ∖ visited   (left-anti join, U1)

The page fetcher is injected per-partition (``make_fetcher`` returns a
callable; a real deployment builds an HTTP client or browser per partition —
the reference's browser-restart-every-50-pages lifecycle,
content-processor.ts:513-561, becomes partition-scoped setup/teardown).
Hermetic tests drive it with a dict-backed fake site.
"""

from __future__ import annotations

import re
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# capture the whole href; the FRAGMENT is stripped after the match (a
# [^"#]+ pattern would refuse to match fragment-bearing hrefs entirely,
# losing pages reachable only via "guide.html#install"-style links — the
# reference resolves the url and drops only the fragment, utils.ts:37-46)
LINK_RE = re.compile(r'href="([^"]+)"')

FETCH_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("markdown", T.StringType()),
        T.StructField("links", T.ArrayType(T.StringType())),
        T.StructField("ok", T.BooleanType()),
    ]
)

Fetcher = Callable[[str], tuple[str, list[str], bool]]


def crawl(
    spark: SparkSession,
    seeds: list[str],
    make_fetcher: Callable[[], Fetcher],
    url_prefix: str,
    max_waves: int = 10,
    max_pages: int = 100_000,
) -> DataFrame:
    """BFS from seeds, admitting only urls under ``url_prefix`` (the
    reference's same-site guard). Returns (url, markdown, ok)."""
    from doc2vec_spark.checkpoints import (
        ckpt_tracked,
        free_blocks,
        free_parked,
        park_blocks,
    )

    # previous crawl's wave checkpoints (fetched pages + final visited set)
    # are dead once a new crawl starts — defer-one-generation free, same as
    # connected_components; see checkpoints.py for the lifetime contract
    free_parked("crawl")
    visited = spark.createDataFrame([(u,) for u in seeds], "url string").limit(0)
    visited_blocks: list = []
    frontier = spark.createDataFrame([(u,) for u in seeds], "url string").distinct()
    results: DataFrame | None = None

    def fetch_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fetcher = make_fetcher()  # per-partition lifecycle (browser/client)
        for pdf in batches:
            rows = {"url": [], "markdown": [], "links": [], "ok": []}
            for url in pdf["url"]:
                markdown, links, ok = fetcher(url)
                rows["url"].append(url)
                rows["markdown"].append(markdown)
                rows["links"].append(links)
                rows["ok"].append(ok)
            yield pd.DataFrame(rows)

    total = 0
    for _ in range(max_waves):
        if frontier.limit(1).count() == 0 or total >= max_pages:
            break
        # localCheckpoint, not cache(): the fetch is non-idempotent (live
        # HTTP/browser calls), and cached partitions can be EVICTED under
        # memory pressure — any later action on the results union would then
        # silently re-issue whole waves of fetches. The checkpoint pins the
        # materialized rows and cuts the fetch stage out of the lineage, so
        # downstream recomputation can never reach it.
        fetched, fetched_blocks = ckpt_tracked(
            frontier.mapInPandas(fetch_partition, FETCH_SCHEMA)
        )
        # the returned results union references every wave's fetched blocks:
        # they must outlive this crawl, so park them for the NEXT crawl's entry
        park_blocks("crawl", fetched_blocks)
        total += fetched.count()
        wave_results = fetched.select("url", "markdown", "ok")
        results = wave_results if results is None else results.unionByName(wave_results)
        # localCheckpoint truncates the visited set's lineage each wave:
        # without it the plan (and the set of live cached RDDs) grows linearly
        # with crawl depth — a deep crawl would re-walk every prior wave's
        # union/distinct on any recompute. The checkpoint pins only the
        # materialized partitions, O(|visited|), independent of depth.
        visited, new_visited_blocks = ckpt_tracked(
            visited.unionByName(frontier).distinct()
        )
        # the new visited set is materialized and every consumer of the old
        # one (this wave's fetch + the union above) has run — free it now so
        # pinned storage stays O(|visited|), not O(sum of wave snapshots)
        free_blocks(visited_blocks)
        visited_blocks = new_visited_blocks
        discovered = (
            fetched.select(F.explode("links").alias("url"))
            .filter(F.col("url").startswith(url_prefix))
            .distinct()
        )
        frontier = discovered.join(visited, "url", "left_anti").distinct()  # U1
    # results never references the visited set — only the fetched waves —
    # so the last visited snapshot can be freed eagerly
    free_blocks(visited_blocks)
    if results is None:
        return spark.createDataFrame([], "url string, markdown string, ok boolean")
    return results


def extract_links(html: str, base_url: str) -> list[str]:
    """href extraction + relative-url resolution (utils.ts:37-46)."""
    from urllib.parse import urljoin

    out = []
    for href in LINK_RE.findall(html):
        if href.startswith("#"):
            continue  # pure fragment: resolves to the page itself
        try:
            resolved = urljoin(base_url, href).split("#", 1)[0]
        except ValueError:
            continue
        if resolved:
            out.append(resolved)
    return out
