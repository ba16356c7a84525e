"""Code chunker — F10 (reference code-chunker.ts:52-182 and
content-processor.ts:2045-2149).

Algorithm (faithful to the reference):
- parse the file into a syntax tree; recursively descend: a node whose
  token count fits the budget (default 512, counter = char count — the
  reference's default tokenCounter is text.length) becomes a chunk; an
  oversized node recurses into its children (code-chunker.ts:125-145)
- greedy sibling merge with a 1-token newline separator
  (code-chunker.ts:147-182)
- markdown files route through the markdown chunker; every chunk gets a
  ``[File: path]`` prefix, hierarchy [path, ...], and
  chunk_id = sha256(url :: content) (content-processor.ts:2058-2082)
- parse failure / unknown language -> fixed-budget token chunker fallback
  (content-processor.ts:2087-2104)

Parsers: the reference loads tree-sitter WASM grammars. This container has
no tree-sitter wheels, so parsing is pluggable: ``_treesitter_tree`` is
attempted first (drops in when py-tree-sitter + grammars are installed,
import-gated), then a Python ``ast``-based tree for Python, then a
structural brace parser for C-family/TS/JS/Go/Java/Rust that preserves the
property the reference's tests assert (tests/README.md:417-501): a construct
that fits the budget always lands whole in one chunk — construct boundaries
are exactly the child boundaries the recursion splits on.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable
from dataclasses import dataclass, field

from doc2vec_spark.chunking import Chunk, chunk_markdown, strip_lone_surrogates

DEFAULT_CHUNK_SIZE = 512  # tokens; char-counter by default (code-chunker.ts:42,46)

TokenCounter = Callable[[str], int]

BRACE_LANGUAGES = {
    "typescript", "javascript", "go", "java", "rust", "c", "cpp", "csharp",
}


@dataclass
class _Node:
    start: int
    end: int
    children: list["_Node"] = field(default_factory=list)


@dataclass
class CodeChunk:
    text: str
    token_count: int


# ---------------------------------------------------------------------------
# parsers
# ---------------------------------------------------------------------------


def _treesitter_tree(text: str, lang: str) -> _Node | None:
    """Real tree-sitter grammar, when installed (the reference's parser)."""
    try:
        from tree_sitter_languages import get_parser  # type: ignore[import-not-found]
    except ImportError:
        return None
    try:
        tree = get_parser(lang).parse(text.encode("utf-8"))
    except Exception:
        return None

    def convert(ts_node) -> _Node:
        return _Node(
            ts_node.start_byte,
            ts_node.end_byte,
            [convert(c) for c in ts_node.children],
        )

    return convert(tree.root_node)


def _python_ast_tree(text: str) -> _Node | None:
    import ast

    try:
        mod = ast.parse(text)
    except SyntaxError:
        return None
    line_starts = [0]
    for line in text.split("\n")[:-1]:
        line_starts.append(line_starts[-1] + len(line) + 1)

    def pos(lineno: int, col: int) -> int:
        return line_starts[lineno - 1] + col

    def convert(node) -> _Node | None:
        if not hasattr(node, "lineno") or node.end_lineno is None:
            return None
        start = pos(node.lineno, node.col_offset)
        end = pos(node.end_lineno, node.end_col_offset)
        children = [c for c in map(convert, ast.iter_child_nodes(node)) if c]
        # keep only children fully inside the span and non-overlapping order
        children = [c for c in children if start <= c.start and c.end <= end]
        return _Node(start, end, children)

    body = [c for c in map(convert, mod.body) if c]
    return _Node(0, len(text), body)


def _brace_tree(text: str, start: int, end: int) -> list[_Node]:
    """Children of span [start,end): one node per statement/declaration; a
    braced block travels with its introducing header, so `fn sig { body }`
    is a single child whose own children are the body statements."""
    children: list[_Node] = []
    i = start
    seg_start = start
    while i < end:
        c = text[i]
        if c in "\"'`":  # string — skip with escapes
            quote = c
            i += 1
            while i < end and text[i] != quote:
                i += 2 if text[i] == "\\" else 1
            i += 1
            continue
        if c == "/" and i + 1 < end and text[i + 1] == "/":
            while i < end and text[i] != "\n":
                i += 1
            continue
        if c == "/" and i + 1 < end and text[i + 1] == "*":
            j = text.find("*/", i + 2, end)
            i = end if j < 0 else j + 2
            continue
        if c == "{":
            depth = 1
            j = i + 1
            while j < end and depth:
                cj = text[j]
                if cj in "\"'`":
                    q = cj
                    j += 1
                    while j < end and text[j] != q:
                        j += 2 if text[j] == "\\" else 1
                elif cj == "{":
                    depth += 1
                elif cj == "}":
                    depth -= 1
                j += 1
            # optional trailing ';' (e.g. const x = { ... };)
            if j < end and text[j] == ";":
                j += 1
            node = _Node(seg_start, j)
            node.children = _brace_tree(text, i + 1, j - (2 if text[j - 1] == ";" else 1))
            children.append(node)
            i = j
            seg_start = j
            continue
        if c == ";" or c == "\n":
            if text[seg_start:i + 1].strip():
                children.append(_Node(seg_start, i + 1))
            i += 1
            seg_start = i
            continue
        i += 1
    if text[seg_start:end].strip():
        children.append(_Node(seg_start, end))
    return children


def _parse(text: str, lang: str) -> _Node | None:
    lang = (lang or "").lower().replace("-", "_")
    tree = _treesitter_tree(text, lang)
    if tree is not None:
        return tree
    if lang == "python":
        return _python_ast_tree(text)
    if lang in BRACE_LANGUAGES:
        root = _Node(0, len(text))
        root.children = _brace_tree(text, 0, len(text))
        return root
    return None


# ---------------------------------------------------------------------------
# chunking core (code-chunker.ts:125-182)
# ---------------------------------------------------------------------------


def _recursive_chunk(
    node: _Node, source: str, chunks: list[CodeChunk], budget: int, count: TokenCounter
) -> None:
    node_text = source[node.start : node.end]
    tokens = count(node_text)
    if tokens <= budget or not node.children:
        if node_text.strip():
            chunks.append(CodeChunk(node_text, tokens))
        return
    before = len(chunks)
    for child in node.children:
        _recursive_chunk(child, source, chunks, budget, count)
    if len(chunks) == before and node_text.strip():
        chunks.append(CodeChunk(node_text, tokens))


def _merge_chunks(chunks: list[CodeChunk], budget: int) -> list[CodeChunk]:
    merged: list[CodeChunk] = []
    cur_text = ""
    cur_tokens = 0
    for c in chunks:
        if not c.text.strip():
            continue
        nxt = cur_tokens + 1 + c.token_count  # 1 = '\n' separator token
        if cur_tokens == 0:
            cur_text, cur_tokens = c.text, c.token_count
            continue
        if nxt <= budget:
            cur_text, cur_tokens = f"{cur_text}\n{c.text}", nxt
            continue
        merged.append(CodeChunk(cur_text, cur_tokens))
        cur_text, cur_tokens = c.text, c.token_count
    if cur_tokens > 0:
        merged.append(CodeChunk(cur_text, cur_tokens))
    return merged


def token_chunks(
    text: str, budget: int = DEFAULT_CHUNK_SIZE, count: TokenCounter = len
) -> list[CodeChunk]:
    """Fallback fixed-budget chunker (the reference's Chonkie token-chunker
    path, content-processor.ts:2087-2104); char-based with the default counter."""
    out: list[CodeChunk] = []
    for i in range(0, len(text), budget):
        piece = text[i : i + budget]
        if piece.strip():
            out.append(CodeChunk(piece, count(piece)))
    return out


def chunk_code_text(
    text: str,
    lang: str,
    budget: int = DEFAULT_CHUNK_SIZE,
    count: TokenCounter = len,
) -> list[CodeChunk]:
    if not text.strip():
        return []
    tree = _parse(text, lang)
    if tree is None:
        return token_chunks(text, budget, count)
    chunks: list[CodeChunk] = []
    _recursive_chunk(tree, text, chunks, budget, count)
    return _merge_chunks(chunks, budget)


# ---------------------------------------------------------------------------
# DocumentChunk assembly (content-processor.ts:2045-2149)
# ---------------------------------------------------------------------------


def _sha(text: str) -> str:
    return hashlib.sha256(text.encode("utf-8", errors="replace")).hexdigest()


def chunk_code_file(
    code: str,
    url: str,
    file_path: str,
    lang: str,
    budget: int = DEFAULT_CHUNK_SIZE,
) -> list[Chunk]:
    """-> markdown-chunker-shaped Chunk rows with [File:] prefixes and
    url-scoped ids (code chunk ids hash url::content, content-processor.ts:2066,2122)."""
    normalized = file_path.replace("\\", "/")
    prefix = f"[File: {normalized}]\n" if normalized else ""

    if lang == "markdown":
        out = []
        for c in chunk_markdown(code):
            content = prefix + c.content
            cid = _sha(f"{url}::{content}")
            out.append(
                Chunk(
                    content=content,
                    heading_hierarchy=[normalized, *c.heading_hierarchy],
                    section=normalized or c.section,
                    chunk_id=cid,
                    chunk_index=c.chunk_index,
                    total_chunks=c.total_chunks,
                )
            )
        return out

    raw = chunk_code_text(code, lang, budget)
    out = []
    for i, c in enumerate(raw):
        content = strip_lone_surrogates(prefix + c.text.strip())
        if not content:
            continue
        cid = _sha(f"{url}::{content}")
        out.append(
            Chunk(
                content=content,
                heading_hierarchy=[normalized] if normalized else [],
                section=normalized or "Code",
                chunk_id=cid,
                chunk_index=i,
                total_chunks=0,
            )
        )
    for c in out:
        c.total_chunks = len(out)
    return out


def chunk_code_files(df, budget: int = DEFAULT_CHUNK_SIZE):
    """code_files(path, repo, branch, language, content) -> chunk rows via
    mapInPandas (same distribution shape as chunking.chunk_documents)."""
    import pandas as pd

    from doc2vec_spark.chunking import CHUNK_SCHEMA
    from doc2vec_spark.tables import ensure_shipped

    ensure_shipped(df.sparkSession)

    def process(batches):
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in CHUNK_SCHEMA.fields}
            for path, repo, branch, language, content in zip(
                pdf["path"], pdf["repo"], pdf["branch"], pdf["language"], pdf["content"]
            ):
                url = f"file://{path}"
                for c in chunk_code_file(content or "", url, path, language, budget):
                    out["url"].append(url)
                    out["product_name"].append("")
                    out["version"].append("")
                    out["branch"].append(branch or "")
                    out["repo"].append(repo or "")
                    out["heading_hierarchy"].append(c.heading_hierarchy)
                    out["section"].append(c.section)
                    out["chunk_id"].append(c.chunk_id)
                    out["content"].append(c.content)
                    out["hash"].append(c.chunk_id)
                    out["chunk_index"].append(c.chunk_index)
                    out["total_chunks"].append(c.total_chunks)
            yield pd.DataFrame(out)

    return df.select("path", "repo", "branch", "language", "content").mapInPandas(
        process, CHUNK_SCHEMA
    )
