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


# ---------------------------------------------------------------------------
# full language matrix — the reference's 18-language boundary-integrity list
# (tests/README.md:417-501); every construct fitting the budget lands whole
# in exactly one chunk while the file as a whole is forced to split
# ---------------------------------------------------------------------------

LANG_FUNCS = {
    "javascript": (
        "function func{i}(x) {{\n  const y = x * {i};\n  return y + 1;\n}}\n\n",
        "function func{i}(",
    ),
    "go": (
        "func Func{i}(x int) int {{\n\ty := x * {i}\n\treturn y + 1\n}}\n\n",
        "func Func{i}(",
    ),
    "rust": (
        "fn func_{i}(x: i64) -> i64 {{\n    let y = x * {i};\n    y + 1\n}}\n\n",
        "fn func_{i}(",
    ),
    "java": (
        "public static int func{i}(int x) {{\n    int y = x * {i};\n    return y + 1;\n}}\n\n",
        "int func{i}(",
    ),
    "kotlin": (
        "fun func{i}(x: Int): Int {{\n    val y = x * {i}\n    return y + 1\n}}\n\n",
        "fun func{i}(",
    ),
    "swift": (
        "func func{i}(_ x: Int) -> Int {{\n    let y = x * {i}\n    return y + 1\n}}\n\n",
        "func func{i}(",
    ),
    "c": (
        "int func{i}(int x) {{\n    int y = x * {i};\n    return y + 1;\n}}\n\n",
        "int func{i}(",
    ),
    "cpp": (
        "int func{i}(int x) {{\n    int y = x * {i};\n    return y + 1;\n}}\n\n",
        "int func{i}(",
    ),
    "csharp": (
        "public static int Func{i}(int x) {{\n    var y = x * {i};\n    return y + 1;\n}}\n\n",
        "int Func{i}(",
    ),
    "php": (
        "function func{i}($x) {{\n    $y = $x * {i};\n    return $y + 1;\n}}\n\n",
        "function func{i}(",
    ),
    "scala": (
        "def func{i}(x: Int): Int = {{\n  val y = x * {i}\n  y + 1\n}}\n\n",
        "def func{i}(",
    ),
    "dart": (
        "int func{i}(int x) {{\n  final y = x * {i};\n  return y + 1;\n}}\n\n",
        "int func{i}(",
    ),
    "zig": (
        "fn func{i}(x: i64) i64 {{\n    const y = x * {i};\n    return y + 1;\n}}\n\n",
        "fn func{i}(",
    ),
    "ruby": (
        "def func_{i}(x)\n  y = x * {i}\n  y + 1\nend\n\n",
        "def func_{i}(",
    ),
    "lua": (
        "function func{i}(x)\n  local y = x * {i}\n  return y + 1\nend\n\n",
        "function func{i}(",
    ),
    "elixir": (
        "def func_{i}(x) do\n  y = x * {i}\n  y + 1\nend\n\n",
        "def func_{i}(",
    ),
    "bash": (
        "func{i}() {{\n  local y=$(( $1 * {i} ))\n  echo $(( y + 1 ))\n}}\n\n",
        "func{i}()",
    ),
}


@pytest.mark.parametrize("lang", sorted(LANG_FUNCS))
def test_boundary_integrity_language_matrix(lang):
    template, sig = LANG_FUNCS[lang]
    n = 12
    while len("".join(template.format(i=i) for i in range(n))) <= DEFAULT_CHUNK_SIZE * 1.5:
        n += 4
    code = "".join(template.format(i=i) for i in range(n))
    assert len(code) > DEFAULT_CHUNK_SIZE  # forces splitting
    chunks = chunk_code_text(code, lang)
    assert len(chunks) > 1, f"{lang}: no split occurred"
    for i in range(n):
        hits = [c for c in chunks if sig.format(i=i) in c.text]
        assert len(hits) == 1, f"{lang} func {i} in {len(hits)} chunks"
        # the whole construct (signature through close) is in that one chunk
        assert template.format(i=i).strip() in hits[0].text, (
            f"{lang} func {i} split mid-body"
        )


def test_class_methods_survive_class_split_ruby():
    methods = "".join(
        f"  def method_{i}(x)\n    y = x * {i}\n    y + 1\n  end\n\n" for i in range(16)
    )
    code = f"class BigClass\n{methods}end\n"
    chunks = chunk_code_text(code, "ruby")
    assert len(chunks) > 1  # class exceeds budget -> split at method level
    for i in range(16):
        hits = [c for c in chunks if f"def method_{i}(" in c.text]
        assert len(hits) == 1
        assert f"def method_{i}(x)\n    y = x * {i}\n    y + 1\n  end" in hits[0].text


def test_sql_statements_stay_whole():
    stmt = (
        "CREATE TABLE t{i} (id INTEGER PRIMARY KEY, name VARCHAR(100), "
        "created TIMESTAMP DEFAULT now());\n"
    )
    code = "".join(stmt.format(i=i) for i in range(12))
    chunks = chunk_code_text(code, "sql")
    assert len(chunks) > 1
    for i in range(12):
        hits = [c for c in chunks if f"CREATE TABLE t{i} (" in c.text]
        assert len(hits) == 1 and f"t{i} (id INTEGER" in hits[0].text


def test_yaml_top_level_blocks_stay_whole():
    block = "service{i}:\n  image: img{i}\n  ports:\n    - {i}80\n  env:\n    KEY: value{i}\n"
    code = "".join(block.format(i=i) for i in range(16))
    chunks = chunk_code_text(code, "yaml")
    assert len(chunks) > 1
    for i in range(16):
        hits = [c for c in chunks if f"service{i}:" in c.text]
        assert len(hits) == 1 and f"KEY: value{i}" in hits[0].text


def test_html_elements_stay_whole():
    el = "<section id=\"s{i}\">\n  <h2>Title {i}</h2>\n  <p>Body text {i}</p>\n</section>\n"
    code = "<html>\n<body>\n" + "".join(el.format(i=i) for i in range(12)) + "</body>\n</html>\n"
    chunks = chunk_code_text(code, "html")
    assert len(chunks) > 1
    for i in range(12):
        hits = [c for c in chunks if f'id="s{i}"' in c.text]
        assert len(hits) == 1 and f"</h2>\n  <p>Body text {i}</p>" in hits[0].text


def test_python_non_ascii_offsets_do_not_bleed():
    """ast col offsets are UTF-8 bytes; spans index characters — non-ASCII
    lines previously shifted every boundary after them."""
    from doc2vec_spark.code_chunking import _python_ast_tree

    src = 's = "ααααα"\ndef f():\n    return 1\n'
    tree = _python_ast_tree(src)
    spans = [src[c.start : c.end] for c in tree.children]
    assert spans == ['s = "ααααα"', "def f():\n    return 1"], spans


def test_brace_tree_ignores_braces_in_comments():
    from doc2vec_spark.code_chunking import chunk_code_text

    src = (
        "function f() {\n  // unmatched } in comment\n  let a = 1;\n"
        "  /* also { here */\n  let b = 2;\n}\n"
        "function g() { return 3; }\n"
    )
    chunks = chunk_code_text(src, "javascript", budget=10_000)
    whole = "\n".join(c.text for c in chunks)
    # f's whole body stays in one construct; nothing splits at comment braces
    assert any("let a = 1;" in c.text and "let b = 2;" in c.text for c in chunks), whole


def test_python_module_comments_survive_chunking():
    from doc2vec_spark.code_chunking import chunk_code_text

    src = "def a():\n    return 1\n\n# important standalone comment\n\ndef b():\n    return 2\n"
    chunks = chunk_code_text(src, "python", budget=6)  # force per-def splitting
    assert any("# important standalone comment" in c.text for c in chunks)
