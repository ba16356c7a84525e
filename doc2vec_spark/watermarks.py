"""Watermark-layer change detection (SURVEY W1/W2/W8; reference
content-processor.ts:386-742).

Layer 1 (W1): sitemap ``lastmod`` — a page whose lastmod equals the stored
value is skipped without any fetch; longest-prefix ``lastmod`` inheritance
covers pages whose parent section carries the signal.
Layer 2 (W2): ETag HEAD checks with adaptive backoff — a fetch-layer
concern; AdaptiveBackoff ports the reference's pacing exactly.
W8: an unfinished previous sync (no ``sync_complete`` flag) forces a full
fetch regardless of lastmod.

The planning step is one broadcast join of the page list against the (tiny)
state snapshot — no per-url loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from doc2vec_spark.store import SyncStateStore


def plan_fetches(
    spark: SparkSession,
    pages: DataFrame,
    state: SyncStateStore,
    url_prefix: str,
) -> DataFrame:
    """pages(url, lastmod) -> (url, lastmod, action in {skip, fetch}).

    skip  = lastmod present and equal to the stored ``lastmod:<url>`` AND the
            previous sync completed (W8 gate, doc2vec.ts:682-687);
    fetch = everything else (new url, changed/absent lastmod, dirty state).
    """
    snapshot = state._load()
    force_full = snapshot.get(f"sync_complete:{url_prefix}") != "true"
    stored = [
        (k.removeprefix("lastmod:"), v)
        for k, v in snapshot.items()
        if k.startswith("lastmod:")
    ]
    stored_df = (
        spark.createDataFrame(stored, "url string, stored_lastmod string")
        if stored
        else spark.createDataFrame([], "url string, stored_lastmod string")
    )
    joined = pages.join(F.broadcast(stored_df), "url", "left")
    can_skip = (
        F.col("lastmod").isNotNull()
        & F.col("stored_lastmod").isNotNull()
        & (F.col("lastmod") == F.col("stored_lastmod"))
        & F.lit(not force_full)
    )
    return joined.select(
        "url",
        "lastmod",
        F.when(can_skip, "skip").otherwise("fetch").alias("action"),
    )


def record_start(state: SyncStateStore, url_prefix: str) -> None:
    """Mark the sync in-flight by CLEARING ``sync_complete:<prefix>``.

    Call between planning and fetching. Without this step the W8 gate is
    dead: the flag written by the last success stays 'true' forever, so a
    sync that crashes mid-run leaves no dirty marker and the NEXT run would
    happily lastmod-skip pages the crashed run half-processed. Protocol:
    plan_fetches (reads flag) -> record_start (clears) -> fetch/process ->
    record_success (sets). A crash anywhere in the middle leaves the flag
    absent, forcing the next run full (doc2vec.ts:682-687 reads its
    sync_complete flag under exactly this discipline)."""
    state.delete(f"sync_complete:{url_prefix}")


def record_success(
    state: SyncStateStore, fetched: list[tuple[str, str | None]], url_prefix: str
) -> None:
    """Advance watermarks ONLY after a fully successful sync (W9: failures
    never advance state, content-processor.ts:795-817)."""
    updates = {f"lastmod:{url}": lm for url, lm in fetched if lm}
    updates[f"sync_complete:{url_prefix}"] = "true"
    state.put_many(updates)


def parse_retry_after(value: str | None, now=None) -> float | None:
    """F13 (content-processor.ts:1274-1291): Retry-After as delta-seconds
    (any finite numeric, incl. decimals/negatives) or an HTTP-date;
    None/unparseable -> None (caller falls back to default). Clamped to a
    1-second minimum in both forms, matching the reference's 1000ms floor."""
    if not value:
        return None
    v = value.strip()
    import math

    try:
        seconds = float(v)
    except ValueError:
        seconds = None
    if seconds is not None:
        return max(1.0, seconds) if math.isfinite(seconds) else None
    from email.utils import parsedate_to_datetime

    try:
        dt = parsedate_to_datetime(v)
    except (TypeError, ValueError):
        return None
    if now is None:
        from datetime import datetime, timezone

        now = datetime.now(timezone.utc)
    return max(1.0, (dt - now).total_seconds())


class AdaptiveBackoff:
    """HEAD-request pacing (content-processor.ts:458-469,643-660): start at
    0; on failure 200ms then x2 capped at 5000ms; on success halve, and snap
    to 0 once the decayed value drops below the 10ms floor — so a recovered
    endpoint stops paying any sleep at all."""

    INITIAL_MS = 200
    CAP_MS = 5000
    FLOOR_MS = 10

    def __init__(self) -> None:
        self.delay_ms = 0

    def on_failure(self) -> int:
        self.delay_ms = (
            self.INITIAL_MS if self.delay_ms == 0 else min(self.delay_ms * 2, self.CAP_MS)
        )
        return self.delay_ms

    def on_success(self) -> int:
        if self.delay_ms > 0:
            self.delay_ms = self.delay_ms // 2
            if self.delay_ms < self.FLOOR_MS:
                self.delay_ms = 0
        return self.delay_ms
