"""Golden-behavior tests for the HTML->Markdown converter (F7/F8), mirroring
the reference's conversion-rule tests (tests/README.md:153-230 region)."""

from __future__ import annotations

from doc2vec_spark.html_markdown import convert_html_to_markdown


def test_headings_paragraphs_links():
    html = "<h1>Title</h1><p>Hello <a href='https://x.y/z'>link</a> world.</p>"
    md = convert_html_to_markdown(html)
    assert "# Title" in md
    assert "[link](https://x.y/z)" in md
    assert md.startswith("# Title")


def test_code_block_dedent_and_fence():
    html = "<pre><code>    def f():\n        return 1\n\n\n    x = 2</code></pre>"
    md = convert_html_to_markdown(html)
    # min-indent removed, blank runs collapsed, plain fences
    assert "```\ndef f():\n    return 1\nx = 2\n```" in md


def test_pre_without_code_uses_text():
    md = convert_html_to_markdown("<pre>  a\n  b</pre>")
    assert "```\na\nb\n```" in md


def test_table_with_pipe_escaping_and_header():
    html = (
        "<table><thead><tr><th>Name</th><th>A|B</th></tr></thead>"
        "<tbody><tr><td>x</td><td></td></tr></tbody></table>"
    )
    md = convert_html_to_markdown(html)
    lines = [line for line in md.split("\n") if line.startswith("|")]
    assert lines[0] == "| Name | A\\|B |"
    assert lines[1] == "|--- | ---|"
    assert lines[2] == "| x | |"  # empty cell -> single space


def test_table_cell_with_paragraphs_joined():
    html = "<table><tr><td><p>one</p><p>two</p></td></tr></table>"
    md = convert_html_to_markdown(html)
    assert "| one two |" in md


def test_lists_nested_and_ordered():
    html = "<ul><li>a</li><li>b<ol><li>c</li><li>d</li></ol></li></ul>"
    md = convert_html_to_markdown(html)
    assert "- a" in md and "- b" in md
    assert "    1. c" in md and "    2. d" in md


def test_emphasis_and_inline_code():
    md = convert_html_to_markdown("<p><strong>bold</strong> <em>it</em> <code>x=1</code></p>")
    assert "**bold**" in md and "*it*" in md and "`x=1`" in md


def test_script_style_dropped_unknown_unwrapped():
    html = "<div><script>evil()</script><style>.x{}</style><section><p>keep</p></section></div>"
    md = convert_html_to_markdown(html)
    assert "evil" not in md and ".x" not in md
    assert "keep" in md


def test_main_content_extraction():
    html = (
        "<body><nav><a href='/'>Home</a> menu menu</nav>"
        "<main><h1>Doc</h1><p>real content here</p></main>"
        "<footer>copyright boilerplate</footer></body>"
    )
    md = convert_html_to_markdown(html, main_content_only=True)
    assert "real content" in md and "# Doc" in md
    assert "menu" not in md and "copyright" not in md


def test_blockquote_and_br():
    md = convert_html_to_markdown("<blockquote>quoted<br>lines</blockquote>")
    assert "> quoted" in md


def test_empty_input():
    assert convert_html_to_markdown("") == ""
    assert convert_html_to_markdown("   ") == ""
