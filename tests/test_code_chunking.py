"""Code-chunker tests — the reference's boundary-integrity method
(tests/README.md:417-501): every construct that fits the budget lands whole
in one chunk, with forced splitting when the file exceeds the budget."""

from __future__ import annotations

import pytest

from doc2vec_spark.code_chunking import (
    DEFAULT_CHUNK_SIZE,
    chunk_code_file,
    chunk_code_text,
    token_chunks,
)

PY_FUNC = '''def func_{i}(x):
    """doc {i}"""
    y = x * {i}
    return y + 1

'''

TS_FUNC = """export function func{i}(x: number): number {{
    const y = x * {i};
    return y + 1;
}}

"""


def _balanced(text: str, open_c: str, close_c: str) -> bool:
    depth = 0
    in_str = None
    for ch in text:
        if in_str:
            if ch == in_str:
                in_str = None
            continue
        if ch in "\"'`":
            in_str = ch
        elif ch == open_c:
            depth += 1
        elif ch == close_c:
            depth -= 1
    return depth == 0


@pytest.mark.parametrize("template,lang,n", [(PY_FUNC, "python", 12), (TS_FUNC, "typescript", 12)])
def test_boundary_integrity(template, lang, n):
    code = "".join(template.format(i=i) for i in range(n))
    assert len(code) > DEFAULT_CHUNK_SIZE  # forces splitting
    chunks = chunk_code_text(code, lang)
    assert len(chunks) > 1
    for c in chunks:
        assert c.token_count <= DEFAULT_CHUNK_SIZE or "\n" not in c.text
        # every chunk is brace/paren balanced: no construct split in half
        assert _balanced(c.text, "(", ")")
        if lang == "typescript":
            assert _balanced(c.text, "{", "}")
    # every function appears in exactly one chunk
    for i in range(n):
        sig = f"def func_{i}(" if lang == "python" else f"function func{i}("
        hits = [c for c in chunks if sig in c.text]
        assert len(hits) == 1, f"func {i} split across {len(hits)} chunks"


def test_small_functions_merge():
    code = "".join(PY_FUNC.format(i=i) for i in range(3))
    chunks = chunk_code_text(code, "python")
    assert len(chunks) == 1  # 3 tiny functions pack into one 512-char budget
    assert chunks[0].token_count <= DEFAULT_CHUNK_SIZE


def test_oversized_function_descends():
    body = "".join(f"    x_{i} = {i} * some_name_{i}\n" for i in range(60))
    code = f"def huge(a):\n{body}    return a\n"
    assert len(code) > DEFAULT_CHUNK_SIZE
    chunks = chunk_code_text(code, "python")
    assert len(chunks) >= 2  # descended into statements


def test_unknown_language_token_fallback():
    text = "word " * 400
    chunks = chunk_code_text(text, "cobol")
    assert all(c.token_count <= DEFAULT_CHUNK_SIZE for c in chunks)
    assert "".join(c.text for c in chunks) == text


def test_unparseable_python_falls_back():
    broken = "def broken(:\n  ???\n" * 100
    chunks = chunk_code_text(broken, "python")
    assert chunks  # token fallback, not an exception
    assert all(c.token_count <= DEFAULT_CHUNK_SIZE for c in chunks)


def test_file_prefix_and_url_scoped_ids():
    code = "def f():\n    return 1\n"
    chunks = chunk_code_file(code, "file:///r/a.py", "src\\a.py", "python")
    assert len(chunks) == 1
    c = chunks[0]
    assert c.content.startswith("[File: src/a.py]\n")  # backslash normalized
    assert c.heading_hierarchy == ["src/a.py"]
    assert c.section == "src/a.py"
    # same content at a different url gets a different id (url-scoped hash)
    other = chunk_code_file(code, "file:///r/b.py", "src/a.py", "python")
    assert other[0].chunk_id != c.chunk_id


def test_markdown_file_via_markdown_chunker():
    md = "# Title\n" + "content " * 120
    chunks = chunk_code_file(md, "file:///r/README.md", "README.md", "markdown")
    assert len(chunks) == 1
    c = chunks[0]
    assert c.content.startswith("[File: README.md]\n[Topic: Title]\n")
    assert c.heading_hierarchy == ["README.md", "Title"]
    assert c.section == "README.md"


def test_chunk_code_files_spark(spark):
    from doc2vec_spark.code_chunking import chunk_code_files

    code = "".join(PY_FUNC.format(i=i) for i in range(12))
    df = spark.createDataFrame(
        [("src/big.py", "o/r", "main", "python", code),
         ("src/tiny.ts", "o/r", "main", "typescript", TS_FUNC.format(i=0))],
        "path string, repo string, branch string, language string, content string",
    )
    rows = chunk_code_files(df).collect()
    assert len(rows) > 2
    by_url = {}
    for r in rows:
        by_url.setdefault(r["url"], []).append(r)
    for url, rs in by_url.items():
        assert sorted(r["chunk_index"] for r in rs) == list(range(len(rs)))
        assert all(r["total_chunks"] == len(rs) for r in rs)
        assert all(r["branch"] == "main" and r["repo"] == "o/r" for r in rs)
