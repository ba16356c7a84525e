"""Markdown chunker — faithful re-implementation of the reference's F9
(content-processor.ts:2151-2336) as a plain Python function plus a
mapInPandas wrapper.

Semantics reproduced exactly (cited to the reference):
- character budget MIN 600 / MAX 4000, 10% overlap on oversize splits
  (content-processor.ts:2155-2157)
- heading-stack hierarchy with reset-below-level on each heading
  (content-processor.ts:2307-2312); anchor-link cleanup (2276-2283)
- sibling-merge rule: keep accumulating when the buffer is small, has
  tracked headings, and the new heading is at the same or deeper level
  (content-processor.ts:2285-2305)
- merged-sibling topic hierarchy: multiple deepest-level headings in one
  buffer -> use their parent prefix (content-processor.ts:2170-2193)
- [Topic: a > b] breadcrumb prefix; section = last hierarchy entry or
  "Introduction" (content-processor.ts:2199-2217)
- chunk_id = hash = sha256(content) after surrogate stripping
  (content-processor.ts:2205-2210, utils.ts:6-8,110-149)
- safety-valve flush when a headingless buffer reaches MAX
  (content-processor.ts:2318-2321); final force flush (2326)
- total_chunks backfilled after the sweep (content-processor.ts:2329-2332)

String lengths and slice positions use UTF-16 code units (JS semantics) so
chunk boundaries — and therefore content hashes — match the reference even
for astral-plane characters; sliceSafe boundary nudging (utils.ts:131-149)
becomes "round the boundary down to the containing code point".

The chunker is the one genuinely imperative operator in the engine, so it
runs as an Arrow-batched mapInPandas stage: one Python pass per document,
fully parallel across partitions, no driver involvement.
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAX_CHARS = 4000
MIN_CHARS = 600
OVERLAP_PERCENT = 0.1

_ANCHOR_RE = re.compile(r"\[.*?\]\(#[^)]*\)")
_EMPTY_ANCHOR_RE = re.compile(r"\[\]\(#[^)]*\)")
_HEADING_PREFIX_RE = re.compile(r"^#+\s*")
_LEVEL_RE = re.compile(r"^(#+)")

# lone-surrogate stripping (utils.ts:119-126); Python strings can carry
# surrogate code points via surrogatepass decoding of dirty input
_LONE_HIGH_RE = re.compile(r"[\ud800-\udbff](?![\udc00-\udfff])")
# lookbehind, NOT a consuming group: a capturing-group form eats the char
# before each match, so re.sub's non-overlapping scan skips every second
# surrogate in a run like '\udc00\udc00'
_LONE_LOW_RE = re.compile(r"(?<![\ud800-\udbff])[\udc00-\udfff]")


def strip_lone_surrogates(text: str) -> str:
    text = _LONE_HIGH_RE.sub("", text)
    return _LONE_LOW_RE.sub("", text)


def sha256_hex(text: str) -> str:
    return hashlib.sha256(text.encode("utf-8", errors="replace")).hexdigest()


def _u16len(s: str) -> int:
    """JS String.length: UTF-16 code units."""
    return len(s) + sum(1 for c in s if ord(c) > 0xFFFF)


def _u16_slice(s: str, start: int, end: int) -> str:
    """Slice by UTF-16 code-unit positions with sliceSafe nudging
    (utils.ts:131-149): a boundary inside a surrogate pair rounds down to
    the code-point start, so a straddled pair travels with the later slice."""
    if not any(ord(c) > 0xFFFF for c in s):
        return s[start:end]
    # map unit offsets -> code point index, rounding down into the char
    positions = []  # unit offset of each code point
    off = 0
    for c in s:
        positions.append(off)
        off += 2 if ord(c) > 0xFFFF else 1
    total = off

    def unit_to_cp(u: int) -> int:
        u = max(0, min(u, total))
        # binary search: last cp with positions[cp] <= u
        lo, hi = 0, len(positions) - 1
        if u >= total:
            return len(positions)
        while lo < hi:
            mid = (lo + hi + 1) // 2
            if positions[mid] <= u:
                lo = mid
            else:
                hi = mid - 1
        return lo

    return s[unit_to_cp(start) : unit_to_cp(end)]


@dataclass
class Chunk:
    content: str
    heading_hierarchy: list[str]
    section: str
    chunk_id: str
    chunk_index: int
    total_chunks: int = 0


@dataclass
class _Heading:
    level: int
    text: str = ""


def chunk_markdown(markdown: str) -> list[Chunk]:
    """Reference chunkMarkdown (content-processor.ts:2151-2336)."""
    chunks: list[Chunk] = []
    buffer = ""
    heading_hierarchy: list[str | None] = []  # sparse array; None = JS hole
    buffer_headings: list[_Heading] = []
    counter = 0

    def compute_topic_hierarchy() -> list[str | None]:
        if not buffer_headings:
            return list(heading_hierarchy)
        deepest = max(h.level for h in buffer_headings)
        deepest_headings = [h for h in buffer_headings if h.level == deepest]
        if len(deepest_headings) > 1 and deepest > 1:
            return list(heading_hierarchy[: deepest - 1])
        return list(heading_hierarchy)

    def create_chunk(content: str, hierarchy: list[str | None]) -> Chunk:
        nonlocal counter
        breadcrumbs = " > ".join(h for h in hierarchy if h)
        prefix = f"[Topic: {breadcrumbs}]\n" if breadcrumbs else ""
        searchable = strip_lone_surrogates(prefix + content.strip())
        chunk_id = sha256_hex(searchable)
        section = (hierarchy[-1] if hierarchy else None) or "Introduction"
        c = Chunk(
            content=searchable,
            heading_hierarchy=[h for h in hierarchy if h],
            section=section,
            chunk_id=chunk_id,
            chunk_index=counter,
        )
        counter += 1
        return c

    def flush_buffer(force: bool = False) -> None:
        nonlocal buffer, buffer_headings
        trimmed = buffer.strip()
        if not trimmed:
            return
        char_count = _u16len(trimmed)
        if char_count < MIN_CHARS and not force:
            return
        topic = compute_topic_hierarchy()
        if char_count > MAX_CHARS:
            overlap = int(MAX_CHARS * OVERLAP_PERCENT)
            i = 0
            while i < char_count:
                chunks.append(create_chunk(_u16_slice(trimmed, i, i + MAX_CHARS), topic))
                i += MAX_CHARS - overlap
        else:
            chunks.append(create_chunk(trimmed, topic))
        buffer = ""
        buffer_headings = []

    for line in markdown.split("\n"):
        if line.startswith("#"):
            m = _LEVEL_RE.match(line)
            level = len(m.group(1)) if m else 1
            heading_text = _EMPTY_ANCHOR_RE.sub(
                "", _ANCHOR_RE.sub("", _HEADING_PREFIX_RE.sub("", line))
            ).strip()

            current_count = _u16len(buffer.strip())
            has_content = current_count > 0
            buffer_small = current_count < MIN_CHARS
            deepest_buffer_level = (
                max(h.level for h in buffer_headings) if buffer_headings else 0
            )
            should_merge = (
                has_content
                and buffer_small
                and bool(buffer_headings)
                and level >= deepest_buffer_level
            )
            if not should_merge and has_content:
                flush_buffer()

            # reset hierarchy below this level (JS sparse-array assignment)
            heading_hierarchy = list(heading_hierarchy[: level - 1])
            while len(heading_hierarchy) < level - 1:
                heading_hierarchy.append(None)
            heading_hierarchy.append(heading_text)

            buffer_headings.append(_Heading(level, heading_text))
            buffer += line + "\n"
        else:
            buffer += line + "\n"
            if _u16len(buffer) >= MAX_CHARS:
                flush_buffer()

    flush_buffer(True)

    total = len(chunks)
    for c in chunks:
        c.total_chunks = total
    return chunks


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("product_name", T.StringType()),
        T.StructField("version", T.StringType()),
        T.StructField("branch", T.StringType()),
        T.StructField("repo", T.StringType()),
        T.StructField("heading_hierarchy", T.ArrayType(T.StringType())),
        T.StructField("section", T.StringType()),
        T.StructField("chunk_id", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("hash", T.StringType()),
        T.StructField("chunk_index", T.IntegerType()),
        T.StructField("total_chunks", T.IntegerType()),
    ]
)


def chunk_documents(
    docs: DataFrame,
    url_col: str = "url",
    markdown_col: str = "markdown",
    product_col: str = "product_name",
    version_col: str = "version",
) -> DataFrame:
    """documents(url, markdown, product_name, version) -> chunk rows.

    mapInPandas: Arrow batches in, one output row per chunk. Chunking is
    embarrassingly parallel per document, so this scales with partitions;
    repartition upstream by url if documents are few and huge.
    """
    import pandas as pd

    from doc2vec_spark.tables import ensure_shipped

    ensure_shipped(docs.sparkSession)
    cols = [url_col, markdown_col, product_col, version_col]

    def process(batches):
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in CHUNK_SCHEMA.fields}
            for url, md, product, version in zip(*[pdf[c] for c in cols]):
                for c in chunk_markdown(md or ""):
                    out["url"].append(url)
                    out["product_name"].append(product)
                    out["version"].append(version)
                    out["branch"].append("")  # non-code source (database.ts:419-425)
                    out["repo"].append("")
                    out["heading_hierarchy"].append(c.heading_hierarchy)
                    out["section"].append(c.section)
                    out["chunk_id"].append(c.chunk_id)
                    out["content"].append(c.content)
                    out["hash"].append(c.chunk_id)
                    out["chunk_index"].append(c.chunk_index)
                    out["total_chunks"].append(c.total_chunks)
            if out["url"]:
                yield pd.DataFrame(out)
            else:
                # a batch whose every doc chunks to zero rows (blank/
                # whitespace markdown) must yield an EMPTY frame with object
                # dtype: pd.DataFrame over empty lists infers float64, and
                # Arrow cannot convert a float64 ndarray to the
                # heading_hierarchy list<string> field
                yield pd.DataFrame(
                    {k: pd.Series(v, dtype="object") for k, v in out.items()}
                )

    return docs.select(*cols).mapInPandas(process, CHUNK_SCHEMA)
