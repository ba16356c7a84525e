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

Parsers: the reference loads tree-sitter WASM grammars for 19 languages
(content-processor.ts:1996-2037). This container has no tree-sitter wheels,
so parsing is pluggable: ``_treesitter_tree`` is attempted first (drops in
when py-tree-sitter + grammars are installed, import-gated), then per-family
structural parsers that preserve the property the reference's tests assert
(tests/README.md:417-501): a construct that fits the budget always lands
whole in one chunk — construct boundaries are exactly the child boundaries
the recursion splits on. Families:

- Python: real ``ast`` tree
- brace languages (TS/JS/Go/Java/Rust/C/C++/C#/Kotlin/Swift/PHP/Scala/
  Dart/Zig/CSS/SCSS/LESS/JSON): brace-matching statement parser
- end-keyword languages (Ruby/Lua/Elixir/Bash): line-based block parser
  driven by per-language open/close token counters
- SQL: ';'-statement splitter (quote/comment aware)
- YAML: indentation tree; HTML: tag-nesting tree
"""

from __future__ import annotations

import hashlib
import re
from collections.abc import Callable
from dataclasses import dataclass, field

from doc2vec_spark.chunking import Chunk, chunk_markdown, strip_lone_surrogates

DEFAULT_CHUNK_SIZE = 512  # tokens; char-counter by default (code-chunker.ts:42,46)

TokenCounter = Callable[[str], int]

BRACE_LANGUAGES = {
    "typescript", "javascript", "go", "java", "rust", "c", "cpp", "csharp",
    "kotlin", "swift", "php", "scala", "dart", "zig",
    "css", "scss", "less", "json",
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
    lines = text.split("\n")
    line_starts = [0]
    for line in lines[:-1]:
        line_starts.append(line_starts[-1] + len(line) + 1)
    line_bytes = [ln.encode("utf-8") for ln in lines]

    def pos(lineno: int, col: int) -> int:
        # ast col_offset/end_col_offset are UTF-8 BYTE offsets; our spans
        # index the CHARACTER string. On any non-ASCII line the two diverge
        # and raw byte columns bleed chunk boundaries into neighboring text.
        lb = line_bytes[lineno - 1]
        ccol = col if len(lb) == len(lines[lineno - 1]) else len(lb[:col].decode("utf-8"))
        return line_starts[lineno - 1] + ccol

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
            # the depth scan must skip comments exactly like the outer scan:
            # a '}' (or an apostrophe starting a phantom string) inside a
            # comment within the block would otherwise terminate it early
            while j < end and depth:
                cj = text[j]
                if cj in "\"'`":
                    q = cj
                    j += 1
                    while j < end and text[j] != q:
                        j += 2 if text[j] == "\\" else 1
                    j += 1
                    continue
                if cj == "/" and j + 1 < end and text[j + 1] == "/":
                    while j < end and text[j] != "\n":
                        j += 1
                    continue
                if cj == "/" and j + 1 < end and text[j + 1] == "*":
                    nxt = text.find("*/", j + 2, end)
                    j = end if nxt < 0 else nxt + 2
                    continue
                if cj == "{":
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


# ---------------------------------------------------------------------------
# end-keyword block languages (Ruby/Lua/Elixir/Bash): line-based parser
# ---------------------------------------------------------------------------


def _line_block_tree(text: str, line_delta: Callable[[str], tuple[int, int]]) -> _Node:
    """Build a block tree from per-line (opens, closes) token counts: a line
    with net opens starts a block node; net closes pop back to the enclosing
    block; balanced lines (statements, one-liner defs) become leaves."""
    root = _Node(0, len(text))
    stack = [root]
    offset = 0
    for raw in text.splitlines(keepends=True):
        start, end = offset, offset + len(raw)
        offset = end
        line = raw.rstrip("\n")
        if not line.strip():
            continue
        opens, closes = line_delta(line)
        net = opens - closes
        if net > 0:
            node = _Node(start, end)
            stack[-1].children.append(node)
            stack.append(node)
        elif net < 0:
            for _ in range(min(-net, len(stack) - 1)):
                stack[-1].end = end
                stack.pop()
        else:
            stack[-1].children.append(_Node(start, end))
    while len(stack) > 1:
        stack[-1].end = len(text)
        stack.pop()
    return root


_RUBY_OPEN = re.compile(
    r"^\s*(def|class|module|if|unless|case|while|until|begin|for)\b"
)
_RUBY_DO = re.compile(r"\bdo\s*(\|[^|]*\|)?\s*$")
_END_TOKEN = re.compile(r"(?<![\w.:@$])end\b")


def _ruby_delta(line: str) -> tuple[int, int]:
    opens = (1 if _RUBY_OPEN.match(line) else 0) + (1 if _RUBY_DO.search(line) else 0)
    return opens, len(_END_TOKEN.findall(line))


def _lua_delta(line: str) -> tuple[int, int]:
    s = line.strip()
    opens = len(re.findall(r"\bfunction\b", line)) + len(
        re.findall(r"\bdo\b", line)
    ) + len(re.findall(r"\brepeat\b", line))
    if not s.startswith(("elseif", "else")):
        opens += len(re.findall(r"\bthen\b", line))
    closes = len(_END_TOKEN.findall(line)) + len(re.findall(r"\buntil\b", line))
    return opens, closes


def _elixir_delta(line: str) -> tuple[int, int]:
    opens = (1 if re.search(r"\bdo\s*$", line) else 0) + len(
        re.findall(r"\bfn\b", line)
    )
    return opens, len(_END_TOKEN.findall(line))


def _bash_delta(line: str) -> tuple[int, int]:
    code = line.split("#", 1)[0]
    s = code.strip()
    opens = len(re.findall(r"\bdo\b", code)) + len(re.findall(r"\bcase\b", code))
    if not s.startswith(("elif", "else")):
        opens += len(re.findall(r"\bthen\b", code))
    if code.rstrip().endswith("{"):
        opens += 1
    closes = len(re.findall(r"\b(fi|done|esac)\b", code))
    if s in ("}", "};"):
        closes += 1
    return opens, closes


_END_BLOCK_DELTAS: dict[str, Callable[[str], tuple[int, int]]] = {
    "ruby": _ruby_delta,
    "lua": _lua_delta,
    "elixir": _elixir_delta,
    "bash": _bash_delta,
    "sh": _bash_delta,
    "shell": _bash_delta,
}


# ---------------------------------------------------------------------------
# SQL / YAML / HTML structural parsers
# ---------------------------------------------------------------------------


def _sql_tree(text: str) -> _Node:
    """One node per ';'-terminated statement; quotes, '--' and block comments
    are opaque."""
    nodes: list[_Node] = []
    i, n, seg = 0, len(text), 0
    while i < n:
        c = text[i]
        if c in "'\"":
            q = c
            i += 1
            while i < n and text[i] != q:
                i += 1
            i += 1
            continue
        if c == "-" and text[i : i + 2] == "--":
            while i < n and text[i] != "\n":
                i += 1
            continue
        if c == "/" and text[i : i + 2] == "/*":
            j = text.find("*/", i + 2)
            i = n if j < 0 else j + 2
            continue
        if c == ";":
            if text[seg : i + 1].strip():
                nodes.append(_Node(seg, i + 1))
            i += 1
            seg = i
            continue
        i += 1
    if text[seg:n].strip():
        nodes.append(_Node(seg, n))
    root = _Node(0, len(text))
    root.children = nodes
    return root


def _yaml_tree(text: str) -> _Node:
    """Indentation tree: an entry owns every following deeper-indented line."""
    root = _Node(0, len(text))
    stack: list[tuple[_Node, int]] = [(root, -1)]
    offset = 0
    for raw in text.splitlines(keepends=True):
        start, end = offset, offset + len(raw)
        offset = end
        line = raw.rstrip("\n")
        if not line.strip() or line.lstrip().startswith("#"):
            continue
        indent = len(line) - len(line.lstrip())
        while len(stack) > 1 and indent <= stack[-1][1]:
            stack[-1][0].end = start
            stack.pop()
        node = _Node(start, end)
        stack[-1][0].children.append(node)
        stack.append((node, indent))
    while len(stack) > 1:
        stack[-1][0].end = len(text)
        stack.pop()
    return root


_HTML_TAG = re.compile(r"<(/?)([a-zA-Z][\w-]*)((?:\"[^\"]*\"|'[^']*'|[^>])*?)(/?)>")
_HTML_VOID = {
    "br", "img", "hr", "meta", "link", "input", "area", "base", "col",
    "embed", "source", "track", "wbr",
}


def _html_tree(text: str) -> _Node:
    root = _Node(0, len(text))
    stack: list[tuple[_Node, str]] = [(root, "")]
    for m in _HTML_TAG.finditer(text):
        closing, name, self_close = m.group(1), m.group(2).lower(), m.group(4)
        if closing:
            if any(n == name for _nd, n in stack[1:]):
                while stack[-1][1] != name:
                    stack[-1][0].end = m.start()
                    stack.pop()
                stack[-1][0].end = m.end()
                stack.pop()
            continue
        node = _Node(m.start(), m.end())
        stack[-1][0].children.append(node)
        if not self_close and name not in _HTML_VOID:
            stack.append((node, name))
    while len(stack) > 1:
        stack[-1][0].end = len(text)
        stack.pop()
    return root


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
    if lang in _END_BLOCK_DELTAS:
        return _line_block_tree(text, _END_BLOCK_DELTAS[lang])
    if lang == "sql":
        return _sql_tree(text)
    if lang == "yaml":
        return _yaml_tree(text)
    if lang == "html":
        return _html_tree(text)
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
    # emit the GAPS between children too: tree-sitter trees carry comments
    # as nodes, but the Python AST (and pruned family trees) do not — an
    # oversized node split into child spans alone would drop every
    # inter-statement comment from the index. Gap text is emitted as leaf
    # chunks; the greedy merge attaches small ones to their neighbors.
    prev = node.start
    for child in node.children:
        gap = source[prev : child.start]
        if gap.strip():
            chunks.append(CodeChunk(gap, count(gap)))
        _recursive_chunk(child, source, chunks, budget, count)
        prev = max(prev, child.end)
    tail = source[prev : node.end]
    if tail.strip():
        chunks.append(CodeChunk(tail, count(tail)))
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

    import re as _re

    def process(batches):
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in CHUNK_SCHEMA.fields}
            for path, repo, branch, language, content in zip(
                pdf["path"], pdf["repo"], pdf["branch"], pdf["language"], pdf["content"]
            ):
                # scheme-bearing paths (s3a://, hdfs://) pass through; only
                # bare local paths gain the file:// prefix
                url = (
                    path
                    if _re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://", str(path))
                    else f"file://{path}"
                )
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
            if out["url"]:
                yield pd.DataFrame(out)
            else:
                # all-empty batch: object dtype, or Arrow cannot convert the
                # float64-inferred empty column to list<string> (same fix as
                # chunking.chunk_documents)
                yield pd.DataFrame(
                    {k: pd.Series(v, dtype="object") for k, v in out.items()}
                )

    return df.select("path", "repo", "branch", "language", "content").mapInPandas(
        process, CHUNK_SCHEMA
    )
