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


# ---------------------------------------------------------------------------
# F8 reference parity: selector cascade, ARIA tab flattening, H1 restore
# (content-processor.ts:1089-1226, 1307-1399)
# ---------------------------------------------------------------------------

CHROME_PAGE = """
<html><body>
<header><h1>link</h1><div class="logo">SiteName</div></header>
<nav><ul><li><a href="/a">Nav A</a></li><li><a href="/b">Nav B</a></li></ul></nav>
<div class="sidebar"><ul><li><a href="/x">Sidebar link with plenty of text here</a></li>
<li><a href="/y">Another long sidebar entry with descriptive text</a></li>
<li><a href="/z">Third sidebar entry, also quite verbose indeed</a></li></ul></div>
<h1>Getting Started Guide</h1>
<div class="docs-content">
<h2>Install</h2><p>Run the installer.</p>
</div>
<footer><p>Copyright legal text and many footer links and disclaimers.</p></footer>
</body></html>
"""


def test_selector_cascade_prefers_docs_content():
    from doc2vec_spark.html_markdown import convert_html_to_markdown

    md = convert_html_to_markdown(CHROME_PAGE, main_content_only=True)
    assert "## Install" in md and "Run the installer." in md
    assert "Sidebar" not in md and "Nav A" not in md and "Copyright" not in md
    # H1 lived outside .docs-content -> re-injected as the title; the
    # icon-only header H1 ("link") is skipped
    assert md.startswith("# Getting Started Guide")
    assert "# link" not in md


def test_markdown_body_beats_main():
    from doc2vec_spark.html_markdown import convert_html_to_markdown

    html = """
    <html><body><main><p>wrapper chrome text</p>
    <div class="markdown-body"><h1>Real Title Here</h1><p>Real body.</p></div>
    </main></body></html>
    """
    md = convert_html_to_markdown(html, main_content_only=True)
    assert "Real body." in md and "wrapper chrome" not in md
    # H1 inside the selected container -> not duplicated
    assert md.count("# Real Title Here") == 1


TABBED_PAGE = """
<html><body><main>
<h1>API Reference Page</h1>
<div role="tablist">
  <button role="tab" aria-controls="panel-npm">npm</button>
  <button role="tab" aria-controls="panel-yarn">yarn</button>
</div>
<div id="panel-npm" role="tabpanel"><pre><code>npm install pkg</code></pre></div>
<div id="panel-yarn" role="tabpanel" class="hx-hidden" style="display: none;">
<pre><code>yarn add pkg</code></pre></div>
</main></body></html>
"""


def test_aria_tabs_flattened_with_labels():
    from doc2vec_spark.html_markdown import convert_html_to_markdown

    md = convert_html_to_markdown(TABBED_PAGE, main_content_only=True)
    # both panels present, each prefixed by its bold tab label
    assert "**npm:**" in md and "npm install pkg" in md
    assert "**yarn:**" in md and "yarn add pkg" in md
    assert md.index("**npm:**") < md.index("npm install pkg")
    assert md.index("**yarn:**") < md.index("yarn add pkg")
    # tab buttons removed -> labels appear exactly once as standalone text
    assert md.count("**npm:**") == 1 and md.count("**yarn:**") == 1


def test_tabs_positional_fallback_and_duplicate_panels():
    from doc2vec_spark.html_markdown import preprocess_tabs, parse_html, _render

    html = """
    <div>
    <button role="tab">TabOne</button><button role="tab">TabTwo</button>
    <button role="tab" aria-controls="p0">DupGroupTab</button>
    <div id="p0" role="tabpanel"><p>first panel</p></div>
    <div role="tabpanel"><p>second panel</p></div>
    </div>
    """
    root = parse_html(html)
    preprocess_tabs(root)
    md = _render(root, {})
    # positional: TabOne -> first panel, TabTwo -> second panel;
    # DupGroupTab points at an already-labeled panel -> skipped
    assert "**TabOne:**" in md and "**TabTwo:**" in md
    assert "DupGroupTab" not in md


def test_table_body_row_identical_to_header_row_no_extra_separator():
    from doc2vec_spark.html_markdown import convert_html_to_markdown

    html = (
        "<table><thead><tr><td>a</td></tr></thead>"
        "<tbody><tr><td>a</td></tr><tr><td>b</td></tr></tbody></table>"
    )
    md = convert_html_to_markdown(html)
    assert md.count("|---|") == 1, md
