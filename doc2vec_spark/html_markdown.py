"""HTML -> Markdown conversion (F7) and main-content extraction (F8)
(reference content-processor.ts:142-275, 1089-1226).

The reference uses sanitize-html + Turndown with custom rules; this module
re-implements the same pipeline on the stdlib html.parser (no external deps):

- sanitize: keep the reference's allowed-tag set, drop script/style
  subtrees, unwrap everything else (content-processor.ts:253-268)
- code blocks: dedent to the minimum indent, trim, collapse blank runs,
  plain ``` fences (content-processor.ts:146-177)
- tables: ``| cell |`` rows with ``\\|`` escaping, header separator after a
  THEAD row, single-space empty cells (content-processor.ts:179-238)
- main-content heuristic standing in for Readability: prefer
  <main>/<article>/role=main, else the densest text container; drop
  nav/header/footer/aside (content-processor.ts:1089-1226)

Runs as a plain function (driver or inside a mapInPandas fetch stage).
Golden-tested in tests/test_html_markdown.py.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser

ALLOWED_TAGS = {
    "h1", "h2", "h3", "h4", "h5", "h6", "p", "a", "ul", "ol",
    "li", "b", "i", "strong", "em", "code", "pre",
    "div", "span", "table", "thead", "tbody", "tr", "th", "td",
    "blockquote", "br",
}
DROP_SUBTREE = {"script", "style", "noscript", "template", "svg", "iframe"}
STRUCTURAL_DROP = {"nav", "header", "footer", "aside"}  # F8 boilerplate

VOID_TAGS = {"br", "img", "hr", "meta", "link", "input"}


@dataclass
class _El:
    tag: str  # "" = document, "#text" = text node
    attrs: dict[str, str] = field(default_factory=dict)
    children: list["_El"] = field(default_factory=list)
    text: str = ""

    def iter(self):
        yield self
        for c in self.children:
            yield from c.iter()

    def text_content(self) -> str:
        if self.tag == "#text":
            return self.text
        return "".join(c.text_content() for c in self.children)

    def find_all(self, *tags: str) -> list["_El"]:
        return [e for e in self.iter() if e.tag in tags]


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _El("")
        self.stack = [self.root]
        self.drop_depth = 0

    def handle_starttag(self, tag, attrs):
        if self.drop_depth:
            if tag in DROP_SUBTREE:
                self.drop_depth += 1
            return
        if tag in DROP_SUBTREE:
            self.drop_depth = 1
            return
        el = _El(tag, dict(attrs))
        self.stack[-1].children.append(el)
        if tag not in VOID_TAGS:
            self.stack.append(el)

    def handle_endtag(self, tag):
        if self.drop_depth:
            if tag in DROP_SUBTREE:
                self.drop_depth -= 1
            return
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        if self.drop_depth or not data:
            return
        self.stack[-1].children.append(_El("#text", text=data))


def parse_html(html: str) -> _El:
    b = _TreeBuilder()
    b.feed(html or "")
    return b.root


# ---------------------------------------------------------------------------
# F8: main-content extraction
# ---------------------------------------------------------------------------


def _has_class(el: _El, cls: str) -> bool:
    return cls in (el.attrs.get("class") or "").split()


def extract_main_content(root: _El) -> _El:
    """Main-content selection with the reference's selector cascade
    (content-processor.ts:1089-1099): `.docs-content` -> `.doc-content` ->
    `.markdown-body` -> `<article>` -> `div[role=main].document` -> `<main>`
    -> body — doc-site content classes beat the semantic elements, so heavy
    chrome around a `.markdown-body` never wins. Falls back to the densest
    text container after dropping nav/header/footer/aside."""

    def prune(el: _El) -> None:
        el.children = [c for c in el.children if c.tag not in STRUCTURAL_DROP]
        for c in el.children:
            prune(c)

    prune(root)
    for cls in ("docs-content", "doc-content", "markdown-body"):
        for el in root.iter():
            if _has_class(el, cls):
                return el
    for el in root.iter():
        if el.tag == "article":
            return el
    for el in root.iter():
        if el.tag == "div" and el.attrs.get("role") == "main" and _has_class(el, "document"):
            return el
    for el in root.iter():
        if el.tag == "main" or el.attrs.get("role") == "main":
            return el
    return root


# ---------------------------------------------------------------------------
# F8b: WAI-ARIA tab flattening (content-processor.ts:1307-1399)
# ---------------------------------------------------------------------------

_HIDING_CLASSES = {"hidden", "hx-hidden", "is-hidden", "display-none", "d-none", "invisible"}


def preprocess_tabs(root: _El) -> None:
    """Flatten tabbed widgets before extraction: inject each tab's label as a
    bold paragraph at the top of its panel (aria-controls id link, positional
    nth-tab->nth-panel fallback), skip panels already labeled (pages reuse
    panel ids across tab groups), unhide the panels, then remove the tab
    buttons so labels don't render twice."""
    tabs = [e for e in root.iter() if e.attrs.get("role") == "tab"]
    if not tabs:
        return
    panels = [e for e in root.iter() if e.attrs.get("role") == "tabpanel"]
    by_id = {e.attrs["id"]: e for e in root.iter() if e.attrs.get("id")}
    labeled: set[int] = set()

    for index, tab in enumerate(tabs):
        label = re.sub(r"\s+", " ", tab.text_content()).strip()
        if not label:
            continue
        panel = by_id.get(tab.attrs.get("aria-controls") or "")
        if panel is None and index < len(panels):
            panel = panels[index]
        if panel is None or id(panel) in labeled:
            continue
        labeled.add(id(panel))

        strong = _El("strong")
        strong.children.append(_El("#text", text=label + ":"))
        label_el = _El("p")
        label_el.children.append(strong)
        panel.children.insert(0, label_el)

        # visibility surgery (parity with the reference; our renderer ignores
        # CSS, but stripped classes keep the sanitized tree faithful)
        classes = [
            c
            for c in (panel.attrs.get("class") or "").split()
            if c not in _HIDING_CLASSES and not re.search(r"\bhidden\b", c, re.I)
        ]
        panel.attrs["class"] = " ".join(classes)
        style = panel.attrs.get("style") or ""
        if "display" in style and "none" in style:
            panel.attrs["style"] = re.sub(r"display\s*:\s*none\s*;?", "", style, flags=re.I)
        panel.attrs["data-state"] = "selected"

    def drop_tabs(el: _El) -> None:
        el.children = [c for c in el.children if c.attrs.get("role") != "tab"]
        for c in el.children:
            drop_tabs(c)

    drop_tabs(root)


_SKIP_H1 = re.compile(r"^(link|#|menu|close)$", re.I)


def extract_page_h1s(root: _El) -> list[str]:
    """H1 texts collected from the FULL document before extraction
    (content-processor.ts:1124-1135): doc sites often put the page title in
    header chrome that main-content selection drops; the first real H1 is
    re-injected as the markdown title."""
    out = []
    for h1 in root.find_all("h1"):
        text = re.sub(r"\s+", " ", h1.text_content()).strip()
        if text and len(text) > 3 and not _SKIP_H1.match(text):
            out.append(text)
    return out


# ---------------------------------------------------------------------------
# F7: markdown rendering
# ---------------------------------------------------------------------------


def _dedent_code(text: str) -> str:
    lines = text.split("\n")
    min_indent = None
    for line in lines:
        if not line.strip():
            continue
        indent = len(line) - len(line.lstrip())
        min_indent = indent if min_indent is None else min(min_indent, indent)
    cleaned = "\n".join(line[min_indent or 0 :] for line in lines)
    cleaned = cleaned.strip()
    return re.sub(r"\n{2,}", "\n", cleaned)


def _cell_text(el: _El) -> str:
    ps = el.find_all("p")
    if ps:
        content = " ".join(p.text_content() for p in ps).strip()
    else:
        content = el.text_content().strip()
    content = re.sub(r"\s+", " ", content)
    return content.replace("|", "\\|")


def _render_table(el: _El) -> str:
    out = []
    rows = el.find_all("tr")
    for tr in rows:
        cells = [c for c in tr.children if c.tag in ("th", "td")]
        if not cells:
            continue
        line = "|" + "".join(
            f" {t} |" if (t := _cell_text(c)) else " |" for c in cells
        )
        out.append(line)
        # IDENTITY containment, not ==: _El is a dataclass with recursive
        # structural equality, so a tbody row structurally identical to a
        # thead row would match `in` and emit a spurious mid-table separator
        # (and each check would deep-compare whole subtrees)
        in_thead = any(
            any(node is tr for node in th.iter()) for th in el.find_all("thead")
        )
        if in_thead:
            out.append("|" + " | ".join("---" for _ in cells) + "|")
    return "\n" + "\n".join(out).strip() + "\n"


def _render_children(el: _El, ctx: dict) -> str:
    return "".join(_render(c, ctx) for c in el.children)


def _render(el: _El, ctx: dict) -> str:
    t = el.tag
    if t == "#text":
        return re.sub(r"\s+", " ", el.text)
    if t == "":
        return _render_children(el, ctx)
    if t not in ALLOWED_TAGS:  # unwrap (sanitize keeps content)
        return _render_children(el, ctx)
    if t in ("h1", "h2", "h3", "h4", "h5", "h6"):
        level = int(t[1])
        return f"\n\n{'#' * level} {el.text_content().strip()}\n\n"
    if t == "p":
        return f"\n\n{_render_children(el, ctx).strip()}\n\n"
    if t == "br":
        return "\n"
    if t == "pre":
        codes = el.find_all("code")
        raw = codes[0].text_content() if codes else el.text_content()
        return f"\n```\n{_dedent_code(raw)}\n```\n"
    if t == "code":
        return f"`{el.text_content().strip()}`"
    if t in ("b", "strong"):
        inner = _render_children(el, ctx).strip()
        return f"**{inner}**" if inner else ""
    if t in ("i", "em"):
        inner = _render_children(el, ctx).strip()
        return f"*{inner}*" if inner else ""
    if t == "a":
        inner = _render_children(el, ctx).strip() or el.attrs.get("href", "")
        href = el.attrs.get("href", "")
        return f"[{inner}]({href})" if href else inner
    if t == "blockquote":
        inner = _render_children(el, ctx).strip()
        quoted = "\n".join(f"> {line}" for line in inner.split("\n"))
        return f"\n\n{quoted}\n\n"
    if t in ("ul", "ol"):
        ctx = {**ctx, "depth": ctx.get("depth", -1) + 1, "ordered": t == "ol", "n": 0}
        items = []
        for c in el.children:
            if c.tag == "li":
                ctx["n"] += 1
                indent = "    " * ctx["depth"]
                marker = f"{ctx['n']}." if ctx["ordered"] else "-"
                body = _render(c, ctx).strip()
                items.append(f"{indent}{marker} {body}")
        return "\n\n" + "\n".join(items) + "\n\n"
    if t == "li":
        return _render_children(el, ctx)
    if t == "table":
        return _render_table(el)
    if t in ("thead", "tbody", "tr", "th", "td"):
        return ""  # handled by _render_table
    return _render_children(el, ctx)


def convert_html_to_markdown(html: str, main_content_only: bool = False) -> str:
    """F7 (+ optional F8) entry point (content-processor.ts:243-275,
    1089-1226): parse -> flatten tabs -> select main content -> render ->
    re-inject the page H1 if extraction dropped it."""
    if not html or not html.strip():
        return ""
    root = parse_html(html)
    page_title = ""
    if main_content_only:
        preprocess_tabs(root)
        h1s = extract_page_h1s(root)
        page_title = h1s[0] if h1s else ""
        root = extract_main_content(root)
    md = _render(root, {})
    md = re.sub(r"[ \t]+\n", "\n", md)
    md = re.sub(r"\n{3,}", "\n\n", md)
    md = md.strip()
    if page_title:
        first_line = md.split("\n", 1)[0] if md else ""
        m = re.match(r"^#\s+(.+)$", first_line)
        existing = re.sub(r"\s+", " ", m.group(1)).strip() if m else ""
        if not m or existing != page_title:
            md = f"# {page_title}\n\n{md}" if md else f"# {page_title}"
    return md
