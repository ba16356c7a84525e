"""Local-directory and code-directory sources (SURVEY S5/S6; reference
content-processor.ts:1696-1947).

The reference walks directories recursively with include/exclude extension
filters, a max_size guard, and an mtime cutoff for incremental code scans.
Spark's binaryFile source does all of that natively at the scan:
``pathGlobFilter`` prunes files before read, ``recursiveFileLookup`` walks,
and the built-in ``modificationTime``/``length`` columns make the mtime
cutoff and size guard plain pushed-down filters. At 100 TB this is exactly
the listing-parallelized scan you want — no driver-side os.walk.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# extension -> language map for code sources: the reference's full map
# (content-processor.ts:1996-2037)
CODE_LANGUAGES = {
    ".ts": "typescript",
    ".tsx": "typescript",
    ".js": "javascript",
    ".jsx": "javascript",
    ".mjs": "javascript",
    ".cjs": "javascript",
    ".py": "python",
    ".go": "go",
    ".rs": "rust",
    ".java": "java",
    ".kt": "kotlin",
    ".kts": "kotlin",
    ".swift": "swift",
    ".c": "c",
    ".cc": "cpp",
    ".cpp": "cpp",
    ".h": "cpp",
    ".hpp": "cpp",
    ".cs": "csharp",
    ".rb": "ruby",
    ".php": "php",
    ".scala": "scala",
    ".sql": "sql",
    ".sh": "bash",
    ".bash": "bash",
    ".zsh": "bash",
    ".html": "html",
    ".css": "css",
    ".scss": "scss",
    ".sass": "scss",
    ".less": "css",
    ".json": "json",
    ".yaml": "yaml",
    ".yml": "yaml",
    ".md": "markdown",
}


def _ci_glob(ext: str) -> str:
    """Case-insensitive glob for one extension: '.md' -> '*.[mM][dD]' — a
    listing-time prune with the SAME admission semantics as the
    case-insensitive endswith filter below (a case-sensitive '*.md' glob
    would silently drop README.MD only when exactly one extension is
    configured)."""
    return "*" + "".join(
        f"[{c.lower()}{c.upper()}]" if c.isalpha() else c for c in ext
    )


def _url_col():
    """Scan path -> source url. Local paths ('file:/abs' or bare) normalize
    to file:///abs; paths already carrying another scheme (s3a://, hdfs://)
    pass through verbatim — wrapping them in file:// would corrupt every
    downstream url key and metadata lookup."""
    other_scheme = F.col("path").rlike("^[a-zA-Z][a-zA-Z0-9+.-]*:") & ~F.col(
        "path"
    ).startswith("file:")
    return F.when(other_scheme, F.col("path")).otherwise(
        F.concat(F.lit("file://"), F.regexp_replace("path", "^file:", ""))
    )


def read_local_directory(
    spark: SparkSession,
    path: str,
    include_extensions: list[str] | None = None,
    max_size_chars: int | None = None,
) -> DataFrame:
    """S5: (url, markdown, mtime, size) rows for every admitted file.
    Extension admission is case-insensitive regardless of how many
    extensions are configured."""
    reader = spark.read.format("binaryFile").option("recursiveFileLookup", "true")
    if include_extensions and len(include_extensions) == 1:
        reader = reader.option("pathGlobFilter", _ci_glob(include_extensions[0]))
    df = reader.load(path)
    if include_extensions:
        pred = F.lit(False)
        for ext in include_extensions:
            pred = pred | F.lower(F.col("path")).endswith(ext.lower())
        df = df.filter(pred)
    out = df.select(
        _url_col().alias("url"),
        F.decode(F.col("content"), "utf-8").alias("markdown"),
        F.col("modificationTime").alias("mtime"),
        F.col("length").alias("size"),
    )
    if max_size_chars is not None:
        # P6 size guard (content-processor.ts:1770-1796)
        out = out.filter(F.length("markdown") <= max_size_chars)
    return out


def read_code_directory(
    spark: SparkSession,
    path: str,
    repo: str = "",
    branch: str = "main",
    mtime_cutoff=None,
    allowed_files: DataFrame | None = None,
) -> DataFrame:
    """S6: code files with language tag, W5 mtime cutoff, and the J2
    semi-join allow-list gate for git-diff incremental scans
    (doc2vec.ts:1189-1199)."""
    df = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(path)
        .select(
            F.regexp_replace("path", "^file:", "").alias("path"),
            F.decode(F.col("content"), "utf-8").alias("content"),
            F.col("modificationTime").alias("mtime"),
        )
    )
    ext = F.lower(F.regexp_extract("path", r"(\.[^./\\]+)$", 1))
    lang_expr = F.lit(None).cast("string")
    for e, lang in CODE_LANGUAGES.items():
        lang_expr = F.when(ext == e, lang).otherwise(lang_expr)
    df = df.withColumn("language", lang_expr).filter(F.col("language").isNotNull())
    if mtime_cutoff is not None:
        df = df.filter(F.col("mtime") > mtime_cutoff)  # W5
    if allowed_files is not None:
        # J2 allow-list gate. The scan's path column is ABSOLUTE (scheme
        # stripped); git-diff sets (sources/git.py) are repo-RELATIVE —
        # joining them raw matches nothing and an incremental scan silently
        # returns zero files. Normalize the (tiny) allow-list side: relative
        # entries are anchored at the scan root.
        # collapse the scheme's slashes the same way the scan column was
        # normalized: both 'file:/abs' and 'file:///abs' inputs must anchor
        # at '/abs' — a bare removeprefix('file:') left '///abs', which never
        # matched and silently emptied incremental scans (ADVICE r03)
        root = re.sub(r"^file:/+", "/", path).rstrip("/")
        allowed_abs = allowed_files.select(
            F.when(
                F.col("path").rlike("^([a-zA-Z][a-zA-Z0-9+.-]*:)?/"),
                F.regexp_replace("path", "^file:/+", "/"),
            )
            .otherwise(F.concat(F.lit(root + "/"), F.col("path")))
            .alias("path")
        )
        df = df.join(F.broadcast(allowed_abs), "path", "left_semi")
    return df.select(
        "path",
        F.lit(repo).alias("repo"),
        F.lit(branch).alias("branch"),
        "language",
        "content",
        "mtime",
    )
